"""End-to-end replay integration test: a generated KAIST-layout fixture
(CSV sensor data + rendered PNG frames + TUM ground truth + gvins.yaml)
driven through ``tools/run_kaist.py`` — the exact command documented for
real urban38/39 data — asserting output files and internal ATE.

This is the CI stand-in for the reference's dataset-replay validation
(``README.md:103-108`` + evo, ``README.md:160-162``); the same entry point
runs the real sequences the moment data is mounted.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.common import earth, rotation as rot
from ic_gvins_tpu.data import simulator as sim

RES = (320, 240)
INTR = (240.0, 240.0, 160.0, 120.0)
ORIGIN_BLH = np.array([37.5 * np.pi / 180.0, 127.0 * np.pi / 180.0, 80.0])


def _write_fixture(root, duration=15.0, frame_rate=5.0, seed=0):
    os.makedirs(os.path.join(root, "sensor_data"), exist_ok=True)
    img_dir = os.path.join(root, "image", "stereo_left")
    os.makedirs(img_dir, exist_ok=True)

    params = sim.default_params(with_earth=True, lat_deg=37.5)
    traj = sim.car_trajectory(speed=5.0)
    key = jax.random.PRNGKey(seed)
    ki, kg, kl = jax.random.split(key, 3)

    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba = jnp.array([5e-3, -8e-3, 2e-3])
    imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
    imu = sim.corrupt_imu(imu, params, ki, bg, ba)
    gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration, 1.0,
                             std=0.05, key=kg)

    t_base = 1.7e9  # KAIST-style absolute unix stamps
    # xsens_imu.csv: time_ns, quat(4), euler(3), gyro(3), accel(3)
    rows = []
    for k in range(imu.n):
        dt = float(imu.dt[k])
        if dt <= 0:
            continue
        w = np.asarray(imu.dtheta[k]) / dt
        a = np.asarray(imu.dvel[k]) / dt
        rows.append([int((t_base + float(imu.time[k])) * 1e9),
                     1, 0, 0, 0, 0, 0, 0, *w, *a])
    np.savetxt(os.path.join(root, "sensor_data", "xsens_imu.csv"),
               np.asarray(rows), delimiter=",",
               fmt=["%d"] + ["%.9f"] * 13)

    # vrs_gps.csv: time_ns, lat deg, lon deg, alt (no cov columns)
    blh = np.asarray(earth.local_to_global(
        jnp.asarray(ORIGIN_BLH), jnp.asarray(gnss.p)))
    r2d = 180.0 / np.pi
    rows = [[int((t_base + float(t)) * 1e9), b[0] * r2d, b[1] * r2d, b[2]]
            for t, b in zip(np.asarray(gnss.time), blh)]
    np.savetxt(os.path.join(root, "sensor_data", "vrs_gps.csv"),
               np.asarray(rows), delimiter=",",
               fmt=["%d", "%.12f", "%.12f", "%.4f"])

    # rendered frames (gray PNG named by ns stamp)
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    lms = sim.scatter_landmarks(traj, params, kl, 140, 0.0, duration + 4.0,
                                lateral=24.0, depth_range=(7.0, 40.0))
    import cv2

    n_frames = int(duration * frame_rate) - 1
    for j in range(n_frames):
        t = (j + 1) / frame_rate + 0.4
        s = sim.truth_state(traj, params, jnp.asarray(t))
        q_wc = rot.quat_mul(s.q, ext_q)
        img = np.asarray(sim.render_sprite_frame(INTR, RES, lms, s.p, q_wc))
        cv2.imwrite(os.path.join(img_dir, f"{int((t_base + t) * 1e9)}.png"),
                    img.astype(np.uint8))

    # TUM ground truth in the local GNSS frame (shared world frame)
    ts = np.arange(0.0, duration, 0.1)
    with open(os.path.join(root, "truth_tum.txt"), "w") as f:
        for t in ts:
            s = sim.truth_state(traj, params, jnp.asarray(float(t)))
            p = np.asarray(s.p)
            q = np.asarray(s.q)  # (w,x,y,z) -> TUM qx qy qz qw
            f.write(f"{t_base + t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")

    # reference-format gvins.yaml for the fixture camera
    qw, qx, qy, qz = np.asarray(ext_q)
    with open(os.path.join(root, "gvins.yaml"), "w") as f:
        f.write(f"""
imudatarate: 200
iswithearth: true
antlever: [0.0, 0.0, 0.0]
imumodel:
  arw: 0.1
  vrw: 0.1
  gbstd: 50.0
  abstd: 50.0
  corrtime: 1.0
track_min_parallax: 12.0
track_max_interval: 0.5
track_max_features: 60
reprojection_error_std: 1.5
optimize_windows_size: 6
optimize_num_iterations: 8
optimize_estimate_extrinsic: false
optimize_estimate_td: false
cam0:
  intrinsic: [{INTR[0]}, {INTR[1]}, {INTR[2]}, {INTR[3]}]
  distortion: [0.0, 0.0, 0.0, 0.0]
  resolution: [{RES[0]}, {RES[1]}]
  q_b_c: [{qx}, {qy}, {qz}, {qw}]
  t_b_c: [0.0, 0.0, 0.0]
  td_b_c: 0.0
""")


@pytest.mark.slow
def test_replay_runner_end_to_end(tmp_path):
    root = str(tmp_path / "seq")
    out = str(tmp_path / "run")
    _write_fixture(root)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_kaist

    result = run_kaist.main([
        "--data", root,
        "--config", os.path.join(root, "gvins.yaml"),
        "--out", out,
        "--ref", os.path.join(root, "truth_tum.txt"),
        "--gps-default-std", "0.05",
        "--bayer", "none",
        "--max-nodes", "16",
        "--max-landmarks", "64",
    ])

    # the replay processed all streams
    assert result["state"] != 0, "no initialization"
    assert result["frames"] > 40
    assert result["keyframes"] >= 2
    assert result["dropped_gnss"] == 0
    # reference-format outputs exist and are non-trivial
    for name in ("gvins.nav", "trajectory.csv", "statistics.txt",
                 "tracking.txt"):
        p = os.path.join(out, name)
        assert os.path.exists(p), f"missing output {name}"
        assert os.path.getsize(p) > 0
    # driver-metric protocol: internal ATE vs TUM truth
    assert result["eval_pairs"] > 20
    assert result["ate_rmse_m"] < 0.6, f"ATE too high: {result}"
