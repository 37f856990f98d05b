#!/usr/bin/env python
"""Bisect the pipeline-test regression: which round-3 vision gate moved the
full-stack rendered-image RMSE (tests/test_pipeline.py)?

Variants: baseline (all round-3 gates), no-parallax-gate, loose-reproj-gate,
and the pre-round-3 behavior (no parallax gate + 0.05 reproj gate).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def run_variant(name, min_parallax, reproj_gate_px):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ic_gvins_tpu.common import rotation as rot
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.config import CameraConfig, EngineConfig
    from ic_gvins_tpu.engine.pipeline import Pipeline

    RES = (320, 240)
    INTR = (240.0, 240.0, 160.0, 120.0)
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    cfg = EngineConfig(
        optimize_num_iterations=8, max_nodes=16, max_landmarks=64,
        optimize_windows_size=6, track_max_features=60,
        track_min_parallax=12.0, antlever=(0.0, 0.0, 0.0),
        triangulate_min_parallax=min_parallax,
        triangulate_reproj_gate_px=reproj_gate_px,
        cam=CameraConfig(
            intrinsic=INTR, distortion=(0.0, 0.0, 0.0, 0.0), resolution=RES,
            q_b_c=tuple(np.asarray(ext_q)), t_b_c=(0.0, 0.0, 0.0),
        ),
    )
    params = sim.default_params(with_earth=True, lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory(speed=5.0)
    duration = 8.0
    key = jax.random.PRNGKey(0)
    kl, ki, kg = jax.random.split(key, 3)
    lms = sim.scatter_landmarks(traj, params, kl, 140, 0.0, duration + 4.0,
                                lateral=24.0, depth_range=(7.0, 40.0))
    imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
    imu = sim.corrupt_imu(imu, params, ki, jnp.array([2e-4, -1e-4, 3e-4]),
                          jnp.array([5e-3, -8e-3, 2e-3]))
    gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration, 1.0,
                             std=0.05, key=kg)
    pipe = Pipeline(cfg, use_pallas=False, use_clahe=False)
    frame_dt = 0.2
    next_frame = 0.4
    gi = 0
    gt = np.asarray(gnss.time)
    for k in range(imu.n):
        dt = float(imu.dt[k])
        if dt == 0.0:
            continue
        t = float(imu.time[k])
        pipe.add_imu(t, dt, np.asarray(imu.dtheta[k]), np.asarray(imu.dvel[k]))
        while gi < len(gt) and gt[gi] <= t:
            pipe.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]),
                          np.asarray(gnss.std[gi]))
            gi += 1
        if t >= next_frame:
            s = sim.truth_state(traj, params, jnp.asarray(next_frame))
            q_wc = rot.quat_mul(s.q, pipe.est.window.ext_q)
            img = sim.render_sprite_frame(INTR, RES, lms, s.p, q_wc)
            pipe.add_image(next_frame, np.asarray(img))
            next_frame += frame_dt

    est = pipe.est
    times, ps, _ = est.trajectory()
    errs = [
        float(np.linalg.norm(
            p - np.asarray(sim.truth_state(traj, params, jnp.asarray(t)).p)))
        for t, p in zip(times, ps) if t >= 4.0
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs)))) if errs else None
    n_tri = int(np.sum(
        np.abs(np.asarray(est.window.lm_invdepth) - 0.1) > 1e-12
    ))
    return dict(variant=name, rmse=round(rmse, 4), n_keyframes=est.n_keyframes,
                n_lm=len(est.lm_slot), n_triangulated_slots=n_tri)


def main():
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = 512 * 1024 * 1024
        if hard == resource.RLIM_INFINITY or hard >= want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all")
    args = ap.parse_args()
    variants = dict(
        r3=("r3 defaults (10px parallax, 1.5px reproj)", 10.0, 1.5),
        nopar=("no parallax gate", 0.0, 1.5),
        loose=("loose reproj 12px (old 0.05 norm)", 10.0, 12.0),
        old=("pre-r3 (no parallax, 12px reproj)", 0.0, 12.0),
    )
    sel = variants if args.variant == "all" else {
        args.variant: variants[args.variant]}
    for k, (name, mp, rs) in sel.items():
        print(json.dumps(run_variant(name, mp, rs)), flush=True)


if __name__ == "__main__":
    main()
