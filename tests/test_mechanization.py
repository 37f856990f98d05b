import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.data.types import ImuSeq
from ic_gvins_tpu.ins import mechanization as mech


def run_mech(with_earth, duration=30.0, rate=200.0):
    params = sim.default_params(with_earth=with_earth)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, 0.0, duration, rate)
    s0 = sim.truth_state(traj, params, jnp.asarray(0.0))
    states = mech.mechanize_scan(params, s0, imu)
    truth_end = sim.truth_state(traj, params, imu.time[-1])
    end = states.index(-1)
    return end, truth_end


def test_mechanization_reproduces_truth_no_earth():
    end, truth = run_mech(with_earth=False)
    assert float(jnp.linalg.norm(end.p - truth.p)) < 2e-3
    assert float(jnp.linalg.norm(end.v - truth.v)) < 1e-3
    dq = rot.quat_mul(rot.quat_inv(end.q), truth.q)
    assert float(jnp.linalg.norm(rot.quat_to_rotvec(dq))) < 1e-5


def test_mechanization_reproduces_truth_with_earth():
    end, truth = run_mech(with_earth=True)
    assert float(jnp.linalg.norm(end.p - truth.p)) < 2e-3
    assert float(jnp.linalg.norm(end.v - truth.v)) < 1e-3
    dq = rot.quat_mul(rot.quat_inv(end.q), truth.q)
    assert float(jnp.linalg.norm(rot.quat_to_rotvec(dq))) < 1e-5


def test_earth_terms_matter():
    # Mechanizing earth-generated IMU with earth terms disabled must drift
    # far more than with them enabled (~earth rate * g * t^2 scale).
    params_e = sim.default_params(with_earth=True)
    params_0 = params_e._replace(iewn=jnp.zeros(3))
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params_e, 0.0, 30.0, 200.0)
    s0 = sim.truth_state(traj, params_e, jnp.asarray(0.0))
    truth = sim.truth_state(traj, params_e, imu.time[-1])
    good = mech.mechanize_scan(params_e, s0, imu).index(-1)
    bad = mech.mechanize_scan(params_0, s0, imu).index(-1)
    err_good = float(jnp.linalg.norm(good.p - truth.p))
    err_bad = float(jnp.linalg.norm(bad.p - truth.p))
    assert err_bad > 10.0 * err_good
    assert err_bad > 0.1  # earth rotation over 30 s is decimeters+


def test_bias_compensation():
    # Mechanization with the true bias in the state must cancel a constant
    # bias injected into the increments.
    params = sim.default_params(with_earth=False)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, 0.0, 10.0, 200.0)
    bg = jnp.array([1e-3, -2e-3, 0.5e-3])
    ba = jnp.array([0.02, -0.01, 0.03])
    imu_b = sim.corrupt_imu(imu, params._replace(gyr_arw=jnp.asarray(0.0), acc_vrw=jnp.asarray(0.0)), jax.random.PRNGKey(0), bg, ba)
    s0 = sim.truth_state(traj, params, jnp.asarray(0.0))._replace(bg=bg, ba=ba)
    end = mech.mechanize_scan(params, s0, imu_b).index(-1)
    truth = sim.truth_state(traj, params, imu.time[-1])
    assert float(jnp.linalg.norm(end.p - truth.p)) < 2e-3


def test_zero_padding_is_noop():
    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, 0.0, 5.0, 200.0)
    s0 = sim.truth_state(traj, params, jnp.asarray(0.0))
    end = mech.mechanize_scan(params, s0, imu).index(-1)
    pad = 17
    imu_p = ImuSeq(
        time=jnp.concatenate([imu.time, jnp.full(pad, imu.time[-1])]),
        dt=jnp.concatenate([imu.dt, jnp.zeros(pad)]),
        dtheta=jnp.concatenate([imu.dtheta, jnp.zeros((pad, 3))]),
        dvel=jnp.concatenate([imu.dvel, jnp.zeros((pad, 3))]),
    )
    end_p = mech.mechanize_scan(params, s0, imu_p).index(-1)
    np.testing.assert_allclose(end.p, end_p.p, atol=1e-12)
    np.testing.assert_allclose(end.q, end_p.q, atol=1e-12)
    np.testing.assert_allclose(end.v, end_p.v, atol=1e-12)


def test_pose_interpolation():
    params = sim.default_params(with_earth=False)
    traj = sim.car_trajectory()
    s0 = sim.truth_state(traj, params, jnp.asarray(1.0))
    s1 = sim.truth_state(traj, params, jnp.asarray(1.2))
    p, q = mech.pose_interpolate(s0, s1, jnp.asarray(1.1))
    truth = sim.truth_state(traj, params, jnp.asarray(1.1))
    # linear interpolation error bound: ~ (1/8) * a * dt^2 ≈ 2.5 mm here
    assert float(jnp.linalg.norm(p - truth.p)) < 5e-3
    dq = rot.quat_mul(rot.quat_inv(q), truth.q)
    assert float(jnp.linalg.norm(rot.quat_to_rotvec(dq))) < 1e-3


def test_zero_velocity_detector():
    params = sim.default_params(with_earth=True)
    static = sim.static_trajectory()
    imu_s = sim.simulate_imu(static, params, 0.0, 2.0, 200.0)
    key = jax.random.PRNGKey(1)
    imu_s = sim.corrupt_imu(imu_s, params, key, jnp.zeros(3), jnp.zeros(3))
    is_zv, _ = mech.detect_zero_velocity(imu_s.dtheta[1:], imu_s.dvel[1:], 200.0)
    assert bool(is_zv)

    moving = sim.car_trajectory()
    imu_m = sim.simulate_imu(moving, params, 0.0, 2.0, 200.0)
    is_zv_m, _ = mech.detect_zero_velocity(imu_m.dtheta[1:], imu_m.dvel[1:], 200.0)
    assert not bool(is_zv_m)


def test_host_predict_matches_device_scan():
    """The host (numpy f64) per-frame prediction mirror must match the
    device mechanization scan over a ~1 s horizon (the newest-node age the
    prediction path ever spans) — VERDICT r4 #4's zero-dispatch frame
    path must not change the predicted poses."""
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.estimator import _np_mechanize_series

    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    t0, dur, rate = 5.0, 1.0, 100.0
    imu = sim.simulate_imu(traj, params, t0, dur, rate)
    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba = jnp.array([5e-3, -8e-3, 2e-3])
    imu = sim.corrupt_imu(imu, params, jax.random.PRNGKey(3), bg, ba)
    s0 = sim.truth_state(traj, params, jnp.asarray(t0))
    s0 = s0._replace(bg=bg, ba=ba)

    states = mech.mechanize_scan(params, s0, imu)
    p_dev = np.asarray(states.p[-1])
    q_dev = np.asarray(states.q[-1])
    v_dev = np.asarray(states.v[-1])

    p, q, v = _np_mechanize_series(
        np.asarray(params.gravity, np.float64),
        np.asarray(params.iewn, np.float64),
        np.asarray(s0.p, np.float64), np.asarray(s0.q, np.float64),
        np.asarray(s0.v, np.float64),
        np.asarray(bg, np.float64), np.asarray(ba, np.float64),
        np.asarray(imu.dt), np.asarray(imu.dtheta), np.asarray(imu.dvel))

    assert np.abs(p - p_dev).max() < 1e-8
    assert np.abs(v - v_dev).max() < 1e-8
    assert min(np.abs(q - q_dev).max(), np.abs(q + q_dev).max()) < 1e-10
