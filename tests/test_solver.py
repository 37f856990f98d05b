import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import build_gins_window, default_cfg, perturb_window

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.solver import assembly, lm
from ic_gvins_tpu.solver.window import empty_prior, make_init_prior


def fd_check(fn, x0, J, eps=1e-6, atol=1e-5):
    """Central finite-difference check of jacfwd output."""
    n = x0.shape[0]
    for i in range(n):
        e = jnp.zeros(n).at[i].set(eps)
        fd = (fn(x0 + e) - fn(x0 - e)) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, atol=atol, rtol=1e-4)


def test_gnss_jacobian_fd():
    win, truth, params, _ = build_gins_window(n_nodes=4, seed=1)
    cfg = default_cfg(antlever=jnp.array([0.2, -0.1, 0.3]))
    from functools import partial

    fn = partial(assembly._gnss_res, win, cfg, 1)
    z = jnp.zeros(6)
    J = jax.jacfwd(fn)(z)
    fd_check(fn, z, J)


def test_preint_jacobian_fd():
    win, truth, params, _ = build_gins_window(n_nodes=4, seed=2)
    from functools import partial

    fn = partial(assembly._preint_res, win, params, 1)
    z = jnp.zeros(30)
    J = jax.jacfwd(fn)(z)
    fd_check(fn, z, J, atol=3e-4)


def test_gins_window_converges():
    n = 8
    win, truth, params, _ = build_gins_window(n_nodes=n, gnss_std=0.05, seed=3)
    cfg = default_cfg()
    win_pert = perturb_window(win, n, jax.random.PRNGKey(7))

    # hold node-0 attitude with an initialization prior (as the reference
    # does after GNSS/INS alignment)
    pose_std = jnp.array([0.1, 0.1, 0.1, 0.5 * jnp.pi / 180] * 1 + [0.5 * jnp.pi / 180, 1.5 * jnp.pi / 180])
    pose_std = jnp.array([0.1, 0.1, 0.1] + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    prior = make_init_prior(win, pose_std, mix_std)

    win_opt, (s1, s2, ncull) = lm.optimize(win_pert, prior, cfg, params, iters=20)

    # cost must drop substantially and positions must land near truth
    assert float(s2.cost1) < float(s1.cost0) * 0.1
    perr = jnp.linalg.norm(win_opt.nodes.p[:n] - truth.p, axis=-1)
    assert float(perr.max()) < 0.2, perr
    verr = jnp.linalg.norm(win_opt.nodes.v[:n] - truth.v, axis=-1)
    assert float(verr.max()) < 0.2, verr
    # attitude within ~1 deg
    dq = rot.quat_mul(rot.quat_inv(win_opt.nodes.q[:n]), truth.q)
    aerr = jnp.linalg.norm(jax.vmap(rot.quat_to_rotvec)(dq), axis=-1)
    assert float(aerr.max()) < 0.02, aerr


def test_gins_gnss_outlier_reweighted():
    n = 8
    win, truth, params, _ = build_gins_window(n_nodes=n, gnss_std=0.05, seed=4)
    cfg = default_cfg()
    # inject a 5 m outlier at node 4
    win = win._replace(gnss_p=win.gnss_p.at[4].add(jnp.array([5.0, -4.0, 2.0])))
    win_pert = perturb_window(win, n, jax.random.PRNGKey(8), dp=0.1)
    pose_std = jnp.array([0.1] * 3 + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    prior = make_init_prior(win, pose_std, mix_std)
    win_opt, _ = lm.optimize(win_pert, prior, cfg, params, iters=20)
    # outlier node must have inflated GNSS std and still-good position
    assert float(win_opt.gnss_std[4, 0]) > 0.2
    perr = jnp.linalg.norm(win_opt.nodes.p[:n] - truth.p, axis=-1)
    assert float(perr.max()) < 0.3, perr


def test_free_mask_freezes_invalid_nodes():
    win, truth, params, _ = build_gins_window(n_nodes=4, n_extra_slots=3, seed=5)
    cfg = default_cfg()
    prior = empty_prior(win.n_nodes)
    win2, _ = lm.optimize(win, prior, cfg, params, iters=4)
    # invalid node slots must not move
    np.testing.assert_allclose(win2.nodes.p[4:], win.nodes.p[4:], atol=0)
    np.testing.assert_allclose(win2.nodes.q[4:], win.nodes.q[4:], atol=0)
