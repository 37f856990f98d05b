#!/usr/bin/env python
"""Fast repro + instrumentation for the urban f32 divergence (t~40-60 s).

Replays the first N seconds of runs/urban_full/sensors.npz through the
real Pipeline in f32 (CPU), recording per-keyframe-round: truth error,
per-node bias norms, solver costs, culls, prior spectrum, recenters.
Writes one JSON to --out for diffing across candidate fixes.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=90.0)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--no-vision", action="store_true")
    ap.add_argument("--sensors", default="runs/urban_full/sensors.npz")
    ap.add_argument("--out", default="/tmp/f32dbg.json")
    ap.add_argument("--recenter", type=float, default=None,
                    help="override recenter_threshold (0 disables; default "
                         "keeps the engine's f32 default of 20 m)")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--gnss-until", type=float, default=1e9,
                    help="drop GNSS after this time (outage diagnostic)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from ic_gvins_tpu.common.compile_cache import enable_compile_cache

    enable_compile_cache(tag="cpu")
    import numpy as np

    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.config import CameraConfig, EngineConfig
    from ic_gvins_tpu.engine.pipeline import Pipeline

    RES = (320, 240)
    INTR = (240.0, 240.0, 160.0, 120.0)
    d = np.load(args.sensors)
    cfg = EngineConfig(
        optimize_num_iterations=args.iters,
        max_nodes=20,
        max_landmarks=160,
        optimize_windows_size=8,
        track_max_features=120,
        track_min_parallax=12.0,
        imudatarate=100.0,
        antlever=(0.0, 0.0, 0.0),
        cam=CameraConfig(
            intrinsic=INTR, distortion=(0.0, 0.0, 0.0, 0.0), resolution=RES,
            q_b_c=tuple(d["ext_q"]), t_b_c=(0.0, 0.0, 0.0),
        ),
        **({} if args.recenter is None
           else dict(recenter_threshold=args.recenter)),
    )
    pipe = Pipeline(cfg, use_pallas=False, use_clahe=False)
    est = pipe.est

    imu_t, imu_dt = d["imu_time"], d["imu_dt"]
    imu_dth, imu_dv = d["imu_dtheta"], d["imu_dvel"]
    g_t, g_p, g_s = d["gnss_time"], d["gnss_p"], d["gnss_std"]
    frame_times = d["frame_times"]
    frame_p, frame_qwc = d["frame_p"], d["frame_qwc"]
    lm_bins, bin_dt = d["lm_bins"], float(d["bin_dt"])

    def truth_at(ts):
        ts = np.atleast_1d(np.asarray(ts, np.float64))
        return np.stack([
            np.interp(ts, frame_times, frame_p[:, i]) for i in range(3)
        ], axis=-1)

    def render(fi: int) -> np.ndarray:
        b = int(frame_times[fi] // bin_dt)
        lms = np.concatenate([lm_bins[max(b - 1, 0)], lm_bins[b],
                              lm_bins[b + 1]])
        return sim.render_sprite_frame_np(
            INTR, RES, lms, frame_p[fi], frame_qwc[fi])

    rounds = []
    gi = fi = 0
    n_frames = 0 if args.no_vision else len(frame_times)
    n_rounds_seen = 0
    for k in range(len(imu_t)):
        if imu_dt[k] == 0.0:
            continue
        t = float(imu_t[k])
        if t > args.duration:
            break
        pipe.add_imu(t, float(imu_dt[k]), imu_dth[k], imu_dv[k])
        while gi < len(g_t) and g_t[gi] <= t:
            if g_t[gi] <= args.gnss_until:
                pipe.add_gnss(float(g_t[gi]), g_p[gi], g_s[gi])
            gi += 1
        while fi < n_frames and frame_times[fi] <= t:
            pipe.add_image(float(frame_times[fi]), render(fi))
            fi += 1
        if len(est.stats) > n_rounds_seen:
            n_rounds_seen = len(est.stats)
            s = est.stats[-1]
            w = est.window
            nv = np.asarray(w.node_valid)
            bg = np.asarray(w.nodes.bg)[nv]
            ba = np.asarray(w.nodes.ba)[nv]
            Hp = np.asarray(est.prior.H, np.float64)
            try:
                ew = np.linalg.eigvalsh(0.5 * (Hp + Hp.T))
            except np.linalg.LinAlgError:
                ew = np.array([np.nan])
            times, ps, _ = est.trajectory()
            err = (float(np.linalg.norm(ps[-1] - truth_at(times[-1])[0]))
                   if len(times) else None)
            rounds.append(dict(
                t=round(float(s["t"]), 2),
                err_m=round(err, 4) if err is not None else None,
                cost0=s["cost0"], cost1=s["cost1"],
                culled=s["culled"],
                out_lm=s["outlier_mappoints"],
                bg_max=float(np.abs(bg).max()),
                ba_max=float(np.abs(ba).max()),
                ba_norm_newest=float(np.linalg.norm(ba[-1])),
                prior_eig_min=float(ew.min()), prior_eig_max=float(ew.max()),
                recenters=est.n_recenters,
                n_lm=int(np.asarray(w.lm_valid).sum()),
                n_obs=s["n_obs"], reproj_rms=round(s["reproj_rms"], 3),
            ))
    out = dict(mode=("f64" if args.f64 else "f32"),
               vision=not args.no_vision, rounds=rounds)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for r in rounds[-8:]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
