"""KAIST-layout loader round trip: write simulator data in the dataset's
CSV format, load it back, and run the GINS engine on it."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import earth
from ic_gvins_tpu.data import kaist
from ic_gvins_tpu.data import simulator as sim

D2R = np.pi / 180.0
ORIGIN = np.array([36.37 * D2R, 127.36 * D2R, 70.0])  # Daejeon-ish


def write_sequence(tmp_path, duration=10.0, rate=100.0):
    params = sim.default_params(with_earth=True, lat_deg=36.37)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, 0.0, duration, rate)

    sensor = os.path.join(tmp_path, "sensor_data")
    os.makedirs(sensor, exist_ok=True)

    # IMU rates in the 17-column xsens layout (stamp, quat4, euler3, gyro3,
    # accel3, mag3)
    t = np.asarray(imu.time)
    dt = np.asarray(imu.dt)
    safe_dt = np.where(dt > 0, dt, 1.0)
    gyro = np.asarray(imu.dtheta) / safe_dt[:, None]
    accel = np.asarray(imu.dvel) / safe_dt[:, None]
    rows = np.zeros((len(t) - 1, 17))
    rows[:, 0] = t[1:] * 1e9
    rows[:, 8:11] = gyro[1:]
    rows[:, 11:14] = accel[1:]
    np.savetxt(os.path.join(sensor, "xsens_imu.csv"), rows, delimiter=",")

    # GNSS fixes as geodetic rows
    gnss = sim.simulate_gnss(
        traj, params, jnp.zeros(3), 0.0, duration, 1.0, std=0.05,
        key=jax.random.PRNGKey(1),
    )
    blh = np.asarray(
        earth.local_to_global(jnp.asarray(ORIGIN), gnss.p)
    )
    grows = np.zeros((len(np.asarray(gnss.time)), 4))
    grows[:, 0] = np.asarray(gnss.time) * 1e9
    grows[:, 1] = blh[:, 0] / D2R
    grows[:, 2] = blh[:, 1] / D2R
    grows[:, 3] = blh[:, 2]
    np.savetxt(os.path.join(sensor, "vrs_gps.csv"), grows, delimiter=",")
    return params, traj, gnss


def test_kaist_roundtrip(tmp_path):
    params, traj, gnss_true = write_sequence(tmp_path)
    imu, gnss, origin = kaist.load_sequence(tmp_path)

    # IMU increments reproduce the simulated ones (first diffs of rates)
    assert imu.n > 900
    assert abs(float(imu.dt[5]) - 0.01) < 1e-6

    # GNSS local positions match the simulated ones to cm (geodetic
    # round-trip through ~1e-9 rad precision of the CSV)
    p_loaded = np.asarray(gnss.p)
    p_true = np.asarray(gnss_true.p)
    # loader anchors at the FIRST FIX, the sim at the trajectory origin:
    # compare shapes, i.e. differences between consecutive fixes
    d_loaded = np.diff(p_loaded, axis=0)
    d_true = np.diff(p_true, axis=0)
    np.testing.assert_allclose(d_loaded, d_true, atol=0.02)


def test_kaist_feeds_engine(tmp_path):
    from test_estimator import small_cfg

    from ic_gvins_tpu.engine.estimator import Estimator

    params, traj, _ = write_sequence(tmp_path, duration=8.0)
    imu, gnss, origin = kaist.load_sequence(tmp_path)

    cfg = small_cfg(antlever=(0.0, 0.0, 0.0), imudatarate=100.0)
    est = Estimator(cfg)
    gi = 0
    gt = np.asarray(gnss.time)
    for k in range(1, imu.n):
        t = float(imu.time[k])
        dt = float(imu.dt[k])
        if dt <= 0:
            continue
        est.add_imu(t, dt, np.asarray(imu.dtheta[k]), np.asarray(imu.dvel[k]))
        while gi < len(gt) and gt[gi] <= t:
            est.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]), np.asarray(gnss.std[gi]))
            gi += 1
    assert est.state != 0
    assert est.n_nodes >= 3
