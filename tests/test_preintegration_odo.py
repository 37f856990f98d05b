import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.ins import preintegration_odo as po


def make_odo_params():
    return po.OdoParams(
        cvb=jnp.eye(3),
        lodo=jnp.array([-0.3, 0.1, 0.5]),
        odo_vrw=jnp.asarray(0.05),
        odo_srw=jnp.asarray(1e-4),
    )


def simulate_odovel(traj, params, odo, imu, sodo_true=0.01):
    """Odometer displacement increments consistent with the kinematic model:
    odovel = |forward velocity at wheel| * dt / (1 + sodo) (the measurement
    the model inverts)."""

    def one(t, dt):
        s = sim.truth_state(traj, params, t)
        # wheel velocity = body velocity + omega x lever (body frame)
        vb = rot.quat_rotate(rot.quat_inv(s.q), s.v)
        # approximate with body x velocity at the wheel point
        qdot = jax.jacfwd(lambda tt: rot.euler_to_quat(traj.euler(tt)))(t)
        w_b = 2.0 * rot.quat_mul(rot.quat_inv(s.q), qdot)[1:]
        v_wheel = vb + jnp.cross(w_b, odo.lodo)
        return v_wheel[0] * dt / (1.0 + sodo_true)

    return jax.vmap(one)(imu.time, imu.dt)


@pytest.mark.parametrize("with_earth", [False, True])
def test_odo_preint_residual_zero_on_truth(with_earth):
    # The odometer model embeds the non-holonomic constraint (wheel travel
    # along the vehicle x-axis only), so validate on a planar trajectory.
    params = sim.default_params(with_earth=with_earth)
    traj = sim.car_trajectory(bump_amp=0.0, roll_amp=0.0, pitch_amp=0.0)
    odo = make_odo_params()
    sodo = jnp.asarray(0.01)
    t0, dur = 3.0, 1.0
    imu = sim.simulate_imu(traj, params, t0, dur, 200.0)
    odovel = simulate_odovel(traj, params, odo, imu, float(sodo))
    s0 = sim.truth_state(traj, params, jnp.asarray(t0))
    s1 = sim.truth_state(traj, params, imu.time[-1])

    data = po.preintegrate_odo(params, odo, s0, sodo, imu, odovel)
    r = po.preint_odo_residual(data, s0, sodo, s1, sodo, params, whiten=False)
    assert float(jnp.linalg.norm(r[0:3])) < 5e-4
    assert float(jnp.linalg.norm(r[3:6])) < 5e-4
    assert float(jnp.linalg.norm(r[6:9])) < 1e-6
    # odometer displacement residual: cm-level over 8 m travelled
    assert float(jnp.linalg.norm(r[15:18])) < 2e-2, r[15:18]
    assert float(r[18]) == 0.0


def test_odo_scale_jacobian():
    """First-order scale correction must track a perturbed re-integration."""
    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    odo = make_odo_params()
    t0, dur = 3.0, 1.0
    imu = sim.simulate_imu(traj, params, t0, dur, 200.0)
    odovel = simulate_odovel(traj, params, odo, imu, 0.0)
    s0 = sim.truth_state(traj, params, jnp.asarray(t0))

    d0 = po.preintegrate_odo(params, odo, s0, jnp.asarray(0.0), imu, odovel)
    eps = 1e-3
    d1 = po.preintegrate_odo(params, odo, s0, jnp.asarray(eps), imu, odovel)
    ds_pred = d0.ds + d0.jac[15:18, 18] * eps
    np.testing.assert_allclose(np.asarray(ds_pred), np.asarray(d1.ds), atol=1e-5)


def test_odo_covariance_psd():
    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    odo = make_odo_params()
    imu = sim.simulate_imu(traj, params, 3.0, 1.0, 200.0)
    odovel = simulate_odovel(traj, params, odo, imu)
    s0 = sim.truth_state(traj, params, jnp.asarray(3.0))
    data = po.preintegrate_odo(params, odo, s0, jnp.asarray(0.01), imu, odovel)
    eig = jnp.linalg.eigvalsh(0.5 * (data.cov + data.cov.T))
    assert float(eig.min()) > 0.0
