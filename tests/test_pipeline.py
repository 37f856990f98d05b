"""Full-stack test: rendered images + IMU + GNSS through the complete
pipeline (KLT front-end + estimator)."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.engine.config import CameraConfig, EngineConfig
from ic_gvins_tpu.engine.pipeline import Pipeline

RES = (320, 240)
INTR = (240.0, 240.0, 160.0, 120.0)


def test_pipeline_images_end_to_end():
    # camera pointing forward: body<-camera quaternion (w,x,y,z)
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    cfg = EngineConfig(
        optimize_num_iterations=8,
        max_nodes=16,
        max_landmarks=64,
        optimize_windows_size=6,
        track_max_features=60,
        track_min_parallax=12.0,
        antlever=(0.0, 0.0, 0.0),
        cam=CameraConfig(
            intrinsic=INTR,
            distortion=(0.0, 0.0, 0.0, 0.0),
            resolution=RES,
            q_b_c=tuple(np.asarray(ext_q)),
            t_b_c=(0.0, 0.0, 0.0),
        ),
    )
    params = sim.default_params(with_earth=True, lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory(speed=5.0)
    duration = 8.0
    key = jax.random.PRNGKey(0)
    kl, ki, kg = jax.random.split(key, 3)

    lms = sim.scatter_landmarks(traj, params, kl, 140, 0.0, duration + 4.0,
                                lateral=24.0, depth_range=(7.0, 40.0))

    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba = jnp.array([5e-3, -8e-3, 2e-3])
    imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
    imu = sim.corrupt_imu(imu, params, ki, bg, ba)
    gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration, 1.0,
                             std=0.05, key=kg)

    pipe = Pipeline(cfg, use_pallas=False, use_clahe=False)

    frame_dt = 0.2  # 5 Hz
    next_frame = 0.4
    gi = 0
    gt = np.asarray(gnss.time)
    ext_p = jnp.zeros(3)
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
            t_wc = s.p + rot.quat_rotate(s.q, ext_p)
            q_wc = rot.quat_mul(s.q, pipe.est.window.ext_q)
            img = sim.render_sprite_frame(INTR, RES, lms, t_wc, q_wc)
            pipe.add_image(next_frame, np.asarray(img))
            next_frame += frame_dt

    est = pipe.est
    assert est.state != 0, "no initialization"
    assert est.n_keyframes >= 2, "no visual keyframes"
    assert len(est.lm_slot) >= 10, "no landmarks created"

    times, ps, _ = est.trajectory()
    errs = []
    for t, p in zip(times, ps):
        if t < 4.0:
            continue
        s = sim.truth_state(traj, params, jnp.asarray(t))
        errs.append(np.linalg.norm(p - np.asarray(s.p)))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # Rendered point-sprite imagery gives ~1 px biased centers when blobs
    # overlap, so the full-stack bound is looser than the ideal-track test.
    # Round 3: the bound moved 0.25 -> 0.45 with the reference-parity
    # compounding chi2 default: systematically biased vision pulls the
    # state while the cull ratchet deweights honest GNSS to its chi2
    # equilibrium (residual pinned at the gate; final inflations ~1.6-4.4x
    # measured by tools/diag_pipeline_gates2.py) — the reference behaves
    # identically by construction (ic_gvins.cc:1286-1295). The
    # non-compounding mode scores ~0.22 here but loses 4x on the
    # persistent-bad-GNSS A/B (tests/test_chi2_ab.py) and failed the
    # outage soak; defaults follow the severe scenarios (BENCH_NOTES r3).
    assert rmse < 0.45, rmse
