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


def test_reproj_analytic_jacobian_matches_jacfwd():
    """The analytic reprojection Jacobian must equal jacfwd of the
    boxplus-perturbed residual to machine precision, across all five
    blocks (ref pose, obs pose, extrinsic, td, invdepth)."""
    import numpy as np
    from functools import partial
    from helpers import build_gvins_window, default_cfg

    from ic_gvins_tpu.factors.residuals import reprojection_residual_jac

    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=5, n_landmarks=12, seed=77
    )
    cfg = default_cfg()
    # non-trivial extrinsic/td so those blocks are exercised
    import jax.numpy as jnp
    from ic_gvins_tpu.common import rotation as rot

    win = win._replace(
        td=jnp.asarray(0.003),
        frame_td=jnp.full(5, 0.001),
        obs_vel=win.obs_vel + 0.05,
    )
    obs_valid = np.asarray(win.obs_valid)
    checked = 0
    for l in range(12):
        for k in range(5):
            if not obs_valid[l, k] or int(win.lm_ref[l]) == k:
                continue
            fn = partial(assembly._reproj_res, win, cfg, l, k)
            z = jnp.zeros(20)
            J_ad = jax.jacfwd(fn)(z)
            ref = int(win.lm_ref[l])
            nref = jax.tree.map(lambda x: x[ref], win.nodes)
            nobs = jax.tree.map(lambda x: x[k], win.nodes)
            invd = win.lm_invdepth[l]
            invd = jnp.where(jnp.abs(invd) < 1e-4, 1e-4, invd)
            r_an, J_an = reprojection_residual_jac(
                nref.p, nref.q, nobs.p, nobs.q,
                win.ext_p, win.ext_q, invd, win.td,
                win.obs_uv[l, ref], win.obs_uv[l, k],
                win.obs_vel[l, ref], win.obs_vel[l, k],
                win.frame_td[ref], win.frame_td[k],
                cfg.reproj_std,
            )
            np.testing.assert_allclose(np.asarray(fn(z)), np.asarray(r_an),
                                       rtol=0, atol=1e-12)
            np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                                       rtol=1e-8, atol=1e-9, err_msg=f"l={l} k={k}")
            checked += 1
            if checked >= 8:
                return
    assert checked >= 4
