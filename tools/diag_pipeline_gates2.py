#!/usr/bin/env python
"""Second bisect for the pipeline-test regression: the triangulation gates
were exonerated (all variants 0.376); test the remaining round-3 changes —
rotation-compensated keyframe parallax, full-pose LK seeds, chi2 default.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, raw_parallax, no_fullpose_seed, chi2_compound,
                reproj_std=1.5):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ic_gvins_tpu.common import rotation as rot
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.config import CameraConfig, EngineConfig
    from ic_gvins_tpu.engine.pipeline import Pipeline
    from ic_gvins_tpu.engine.estimator import Estimator

    RES = (320, 240)
    INTR = (240.0, 240.0, 160.0, 120.0)
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    cfg = EngineConfig(
        optimize_num_iterations=8, max_nodes=16, max_landmarks=64,
        optimize_windows_size=6, track_max_features=60,
        track_min_parallax=12.0, antlever=(0.0, 0.0, 0.0),
        chi2_compound=chi2_compound,
        reprojection_error_std=reproj_std,
        cam=CameraConfig(
            intrinsic=INTR, distortion=(0.0, 0.0, 0.0, 0.0), resolution=RES,
            q_b_c=tuple(np.asarray(ext_q)), t_b_c=(0.0, 0.0, 0.0),
        ),
    )

    saved_kd = Estimator._keyframe_decision
    saved_lp = Estimator.landmark_positions
    if raw_parallax:
        def old_kd(self, t, ids, uv):
            if not any(self.node_is_kf):
                return True
            last_kf_t = max(
                tt for tt, k in zip(self.node_times, self.node_is_kf) if k)
            obs_uv = np.asarray(self.window.obs_uv)
            obs_valid = np.asarray(self.window.obs_valid)
            focal = 0.5 * (self.cfg.cam.intrinsic[0] + self.cfg.cam.intrinsic[1])
            ds = []
            for fid, xy in zip(ids, uv):
                slot = self.lm_slot.get(fid)
                if slot is None or not obs_valid[slot].any():
                    continue
                k_last = np.nonzero(obs_valid[slot])[0][-1]
                ds.append(np.linalg.norm(xy - obs_uv[slot, k_last]) * focal)
            self._last_parallax = float(np.mean(ds)) if ds else 0.0
            if bool(ds) and self._last_parallax > self.cfg.track_min_parallax:
                self._kf_kind = "normal"
                return True
            if t - last_kf_t > self.cfg.track_max_interval:
                self._kf_kind = "second_new"
                return True
            return False
        Estimator._keyframe_decision = old_kd
    if no_fullpose_seed:
        def no_lp(self, ids):
            return np.zeros((len(ids), 3)), np.zeros(len(ids), bool)
        Estimator.landmark_positions = no_lp

    try:
        params = sim.default_params(with_earth=True,
                                    lat_deg=cfg.track_ref_lat_deg)
        traj = sim.car_trajectory(speed=5.0)
        duration = 8.0
        key = jax.random.PRNGKey(0)
        kl, ki, kg = jax.random.split(key, 3)
        lms = sim.scatter_landmarks(traj, params, kl, 140, 0.0, duration + 4.0,
                                    lateral=24.0, depth_range=(7.0, 40.0))
        imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
        imu = sim.corrupt_imu(imu, params, ki, jnp.array([2e-4, -1e-4, 3e-4]),
                              jnp.array([5e-3, -8e-3, 2e-3]))
        gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration,
                                 1.0, std=0.05, key=kg)
        pipe = Pipeline(cfg, use_pallas=False, use_clahe=False)
        next_frame = 0.4
        gi = 0
        gt = np.asarray(gnss.time)
        for k in range(imu.n):
            dt = float(imu.dt[k])
            if dt == 0.0:
                continue
            t = float(imu.time[k])
            pipe.add_imu(t, dt, np.asarray(imu.dtheta[k]),
                         np.asarray(imu.dvel[k]))
            while gi < len(gt) and gt[gi] <= t:
                pipe.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]),
                              np.asarray(gnss.std[gi]))
                gi += 1
            if t >= next_frame:
                s = sim.truth_state(traj, params, jnp.asarray(next_frame))
                q_wc = rot.quat_mul(s.q, pipe.est.window.ext_q)
                img = sim.render_sprite_frame(INTR, RES, lms, s.p, q_wc)
                pipe.add_image(next_frame, np.asarray(img))
                next_frame += 0.2
    finally:
        Estimator._keyframe_decision = saved_kd
        Estimator.landmark_positions = saved_lp

    est = pipe.est
    times, ps, _ = est.trajectory()
    errs = [
        float(np.linalg.norm(
            p - np.asarray(sim.truth_state(traj, params, jnp.asarray(t)).p)))
        for t, p in zip(times, ps) if t >= 4.0
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs)))) if errs else None
    # binned errors over the run (1 s bins) + final GNSS inflation state
    rows = [(t, float(np.linalg.norm(
        p - np.asarray(sim.truth_state(traj, params, jnp.asarray(t)).p))))
        for t, p in zip(times, ps)]
    bins = {}
    for t, e in rows:
        bins.setdefault(int(t), []).append(e)
    binned = {k: round(max(v), 3) for k, v in sorted(bins.items())}
    w = est.window
    gs, gb = np.asarray(w.gnss_std), np.asarray(w.gnss_std_base)
    gv = np.asarray(w.gnss_valid)
    infl = [round(float(gs[i].mean() / max(gb[i].mean(), 1e-9)), 1)
            for i in range(len(gv)) if gv[i]]
    return dict(variant=name, rmse=round(rmse, 4), n_keyframes=est.n_keyframes,
                n_lm=len(est.lm_slot), binned_max=binned, gnss_inflation=infl)


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
    # (raw_parallax, no_fullpose_seed, chi2_compound)
    variants = dict(
        r3=("r3 as-is", False, False, True),
        rawpar=("raw (uncompensated) kf parallax", True, False, True),
        noseed=("no full-pose LK seed", False, True, True),
        oldchi2=("chi2 non-compounding (r2 default)", False, False, False),
        r2all=("all three reverted", True, True, False),
        honest2=("compound + reproj_std 2.5px", False, False, True, 2.5),
        honest3=("compound + reproj_std 3.5px", False, False, True, 3.5),
    )
    sel = variants if args.variant == "all" else {
        args.variant: variants[args.variant]}
    for k, v in sel.items():
        print(json.dumps(run_variant(*v)), flush=True)


if __name__ == "__main__":
    main()
# appended variants: honest vision-noise spec under the compounding default
