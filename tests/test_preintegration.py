import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.data.types import ImuSeq
from ic_gvins_tpu.ins import preintegration as pi


def make_interval(with_earth=True, t0=2.0, dur=1.0, rate=200.0, bias=False):
    params = sim.default_params(with_earth=with_earth)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, t0, dur, rate)
    s0 = sim.truth_state(traj, params, jnp.asarray(t0))
    s1 = sim.truth_state(traj, params, imu.time[-1])
    if bias:
        bg = jnp.array([2e-4, -1e-4, 3e-4])
        ba = jnp.array([5e-3, -8e-3, 2e-3])
        imu = sim.corrupt_imu(
            imu,
            params._replace(gyr_arw=jnp.asarray(0.0), acc_vrw=jnp.asarray(0.0)),
            jax.random.PRNGKey(0), bg, ba,
        )
        s0 = s0._replace(bg=bg, ba=ba)
        s1 = s1._replace(bg=bg, ba=ba)
    return params, imu, s0, s1


@pytest.mark.parametrize("with_earth", [False, True])
def test_preint_residual_zero_on_truth(with_earth):
    params, imu, s0, s1 = make_interval(with_earth=with_earth)
    data = pi.preintegrate(params, s0, imu)
    r = pi.preint_residual(data, s0, s1, params, whiten=False)
    # position/velocity residual ~ integration order; attitude tight
    assert float(jnp.linalg.norm(r[0:3])) < 5e-4
    assert float(jnp.linalg.norm(r[3:6])) < 5e-4
    assert float(jnp.linalg.norm(r[6:9])) < 1e-6
    assert float(jnp.linalg.norm(r[9:15])) == 0.0


def test_preint_residual_zero_with_bias():
    params, imu, s0, s1 = make_interval(with_earth=True, bias=True)
    data = pi.preintegrate(params, s0, imu)
    r = pi.preint_residual(data, s0, s1, params, whiten=False)
    assert float(jnp.linalg.norm(r[0:3])) < 5e-4
    assert float(jnp.linalg.norm(r[3:6])) < 5e-4
    assert float(jnp.linalg.norm(r[6:9])) < 1e-6


def test_end_state_matches_mechanization():
    from ic_gvins_tpu.ins import mechanization as mech

    params, imu, s0, s1 = make_interval(with_earth=True)
    data = pi.preintegrate(params, s0, imu)
    states = mech.mechanize_scan(params, s0, imu)
    end = states.index(-1)
    np.testing.assert_allclose(data.end_state.p, end.p, atol=1e-9)
    np.testing.assert_allclose(data.end_state.v, end.v, atol=1e-9)
    np.testing.assert_allclose(data.end_state.q, end.q, atol=1e-12)


def test_bias_jacobian_first_order():
    # corrected delta via Jacobian ≈ re-preintegration with perturbed bias
    params, imu, s0, s1 = make_interval(with_earth=True)
    data = pi.preintegrate(params, s0, imu)
    dbg = jnp.array([1e-4, -2e-4, 1.5e-4])
    dba = jnp.array([2e-3, 1e-3, -3e-3])

    s0p = s0._replace(bg=s0.bg + dbg, ba=s0.ba + dba)
    data_p = pi.preintegrate(params, s0p, imu)

    corr_p = data.dp + data.jac[0:3, 9:12] @ dbg + data.jac[0:3, 12:15] @ dba
    corr_v = data.dv + data.jac[3:6, 9:12] @ dbg + data.jac[3:6, 12:15] @ dba
    corr_q = rot.quat_mul(data.dq, rot.rotvec_to_quat(data.jac[6:9, 9:12] @ dbg))

    # First-order correction should track the true change to ~ |db|^2 level
    assert float(jnp.linalg.norm(corr_p - data_p.dp)) < 5e-5
    assert float(jnp.linalg.norm(corr_v - data_p.dv)) < 1e-4
    dq_err = rot.quat_mul(rot.quat_inv(corr_q), data_p.dq)
    assert float(jnp.linalg.norm(rot.quat_to_rotvec(dq_err))) < 1e-6


def test_covariance_psd_and_monotone():
    params, imu, s0, _ = make_interval(with_earth=True, dur=2.0)
    data = pi.preintegrate(params, s0, imu)
    eig = jnp.linalg.eigvalsh(0.5 * (data.cov + data.cov.T))
    assert float(eig.min()) > 0.0
    # longer integration -> strictly larger position variance
    half = ImuSeq(*(jax.tree.map(lambda x: x[: imu.n // 2], tuple(imu))))
    data_half = pi.preintegrate(params, s0, half)
    assert float(jnp.trace(data.cov[:3, :3])) > float(jnp.trace(data_half.cov[:3, :3]))


def test_sqrt_information_whitens():
    params, imu, s0, s1 = make_interval(with_earth=True)
    data = pi.preintegrate(params, s0, imu)
    sqrt_info = pi.sqrt_information(data.cov)
    recon = jnp.linalg.inv(sqrt_info.T @ sqrt_info)
    np.testing.assert_allclose(recon, data.cov, rtol=1e-6, atol=1e-20)


def test_zero_padding_noop():
    params, imu, s0, s1 = make_interval(with_earth=True)
    data = pi.preintegrate(params, s0, imu)
    pad = 13
    imu_p = ImuSeq(
        time=jnp.concatenate([imu.time, jnp.full(pad, imu.time[-1])]),
        dt=jnp.concatenate([imu.dt, jnp.zeros(pad)]),
        dtheta=jnp.concatenate([imu.dtheta, jnp.zeros((pad, 3))]),
        dvel=jnp.concatenate([imu.dvel, jnp.zeros((pad, 3))]),
    )
    data_p = pi.preintegrate(params, s0, imu_p)
    np.testing.assert_allclose(data.dp, data_p.dp, atol=1e-12)
    np.testing.assert_allclose(data.dq, data_p.dq, atol=1e-14)
    np.testing.assert_allclose(data.cov, data_p.cov, atol=1e-15)
    np.testing.assert_allclose(data.jac, data_p.jac, atol=1e-12)


def test_analytic_jacobian_matches_jacfwd():
    """The analytic factor Jacobian (preint_residual_jac) must equal
    jacfwd of the boxplus-perturbed unwhitened residual to machine
    precision — including the Earth/Coriolis blocks and the SO(3)
    right-Jacobian term of the bias correction."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.factors.manifold import node_boxplus
    from ic_gvins_tpu.ins import preintegration as pre

    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    imu = sim.simulate_imu(traj, params, 5.0, 0.8, 200.0)
    s0 = sim.truth_state(traj, params, jnp.asarray(5.0))
    # bias offsets so the correction terms (and Jr) are exercised
    s0 = s0._replace(bg=jnp.array([3e-3, -2e-3, 1e-3]),
                     ba=jnp.array([0.02, -0.03, 0.01]))
    out = pre.preintegrate(params, s0._replace(bg=jnp.zeros(3), ba=jnp.zeros(3)), imu)
    s1 = out.end_state._replace(
        p=out.end_state.p + jnp.array([0.05, -0.02, 0.03]),
        v=out.end_state.v + jnp.array([0.1, 0.05, -0.08]),
        bg=jnp.array([2e-3, -1e-3, 2e-3]),
        ba=jnp.array([0.01, -0.02, 0.02]),
    )

    def res(delta30):
        a = node_boxplus(s0, delta30[:15])
        b = node_boxplus(s1, delta30[15:])
        return pre.preint_residual(out, a, b, params, whiten=False)

    z = jnp.zeros(30)
    J_ad = jax.jacfwd(res)(z)
    r_an, J_an = pre.preint_residual_jac(out, s0, s1, params)
    np.testing.assert_allclose(np.asarray(res(z)), np.asarray(r_an),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               rtol=1e-9, atol=1e-11)
