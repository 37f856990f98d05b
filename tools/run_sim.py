#!/usr/bin/env python
"""Replay runner: synthetic GNSS/IMU(/camera) sequence -> engine -> outputs.

The offline analog of the reference's ROS node + rosbag replay
(``fusion_ros.cc``): builds a sensor stream, feeds the estimator in time
order, writes reference-format result files (gvins.nav, trajectory.csv,
IMU_ERR.txt, statistics.txt), and reports ATE against the simulator truth.

Supports the reference's GNSS-outage fault injection
(``--gnss-outage-time``, parity ``fusion_ros.cc:199-211``).

Usage:
    python tools/run_sim.py --duration 30 --vision --out runs/demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--vision", action="store_true")
    ap.add_argument("--gnss-std", type=float, default=0.05)
    ap.add_argument("--gnss-outage-time", type=float, default=None)
    ap.add_argument("--imu-rate", type=float, default=200.0)
    ap.add_argument("--frame-rate", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/sim")
    ap.add_argument("--landmarks", type=int, default=96)
    ap.add_argument("--odo", action="store_true",
                    help="fuse a simulated wheel odometer (ODO/EARTH_ODO "
                         "preintegration with online scale estimation)")
    ap.add_argument("--sodo-true", type=float, default=0.03,
                    help="true odometer scale error injected by the simulator")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu", "axon"),
                    help="cpu (default): f64 validation path on host; "
                         "tpu/axon: run on the accelerator")
    ap.add_argument("--f32", action="store_true",
                    help="run the engine in float32 (the TPU numeric mode: "
                         "x64 off, window re-centering on) — on CPU this "
                         "validates exactly what the chip executes")
    ap.add_argument("--config", default=None,
                    help="reference-format gvins.yaml: engine keys are "
                         "loaded via EngineConfig.from_yaml; the runner "
                         "keys isusegnssoutage/gnssoutagetime/outputpath "
                         "are honored here (parity fusion_ros.cc:71-102)")
    args = ap.parse_args()

    import jax

    # The env's sitecustomize pins jax_platforms at interpreter startup, so
    # JAX_PLATFORMS alone is not enough — force the config key directly.
    if args.platform == "cpu":
        from ic_gvins_tpu.common.compile_cache import enable_compile_cache
        enable_compile_cache()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", not args.f32)

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_estimator import run_sequence, small_cfg, ate

    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.outputs import RunWriter

    if args.config is not None:
        import yaml

        from ic_gvins_tpu.engine.config import EngineConfig

        cfg = EngineConfig.from_yaml(args.config)
        # runner keys (parity fusion_ros.cc:84-97, 199-211)
        with open(args.config) as f:
            ycfg = yaml.safe_load(f)
        if ycfg.get("isusegnssoutage") and args.gnss_outage_time is None:
            args.gnss_outage_time = float(ycfg["gnssoutagetime"])
        if args.out == ap.get_default("out") and ycfg.get("outputpath"):
            args.out = ycfg["outputpath"]
            if ycfg.get("is_make_outputdir", False):
                args.out = os.path.join(
                    args.out, time.strftime("%Y%m%d%H%M%S")
                )
        # keep the replay problem sized for this runner's synthetic window
        cfg.max_nodes = 16
        cfg.max_landmarks = 64
    elif args.odo:
        from ic_gvins_tpu.engine.config import OdoConfig

        cfg = small_cfg(antlever=(0.0, 0.0, 0.0),
                        odo=OdoConfig(use_odo=True, odo_vrw=0.03,
                                      sodo_prior_std=0.05))
    else:
        cfg = small_cfg()
    t0 = time.perf_counter()
    est, traj, params = run_sequence(
        cfg,
        duration=args.duration,
        with_vision=args.vision,
        gnss_std=args.gnss_std,
        seed=args.seed,
        imu_rate=args.imu_rate,
        frame_rate=args.frame_rate,
        n_landmarks=args.landmarks,
        gnss_until=args.gnss_outage_time,
        odo_sodo_true=args.sodo_true if args.odo else None,
    )
    wall = time.perf_counter() - t0

    writer = RunWriter(args.out)
    times, ps, qs = est.trajectory()
    from ic_gvins_tpu.data.types import NavState

    zero3 = jnp.zeros(3)
    for t, p, q in zip(times, ps, qs):
        state = NavState(
            time=jnp.asarray(t), p=jnp.asarray(p), q=jnp.asarray(q),
            v=zero3, bg=est.window.nodes.bg[0], ba=est.window.nodes.ba[0],
        )
        writer.write_nav(state, decimate=1)
    for row in est.stats:
        writer.write_statistics(row)
    for row in est.track_log:
        writer.write_tracking(**row)
    if est.fixed_mappoints:
        writer.write_mappoints(est.fixed_mappoints)
    writer.write_extrinsic(
        times[-1] if len(times) else 0.0, est.window.ext_p, est.window.ext_q,
        est.window.td,
    )
    writer.close()

    rmse, mx = ate(est, traj, params, t_min=5.0)
    n_frames = len(times)
    result = dict(
        ate_rmse_m=round(rmse, 4),
        ate_max_m=round(mx, 4),
        nodes_processed=n_frames,
        wall_s=round(wall, 2),
        nodes_per_s=round(n_frames / wall, 2),
        state=est.state,
        outdir=args.out,
    )
    if args.odo:
        result["sodo_est"] = round(float(est.window.sodo), 5)
        result["sodo_true"] = args.sodo_true
    print(json.dumps(result))


if __name__ == "__main__":
    main()
