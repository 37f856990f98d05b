import jax
import jax.numpy as jnp
import numpy as np

from helpers import build_gvins_window, default_cfg, perturb_window

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.solver import lm
from ic_gvins_tpu.solver.window import make_init_prior


def std_priors():
    pose_std = jnp.array([0.1] * 3 + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    return pose_std, mix_std


def test_reproj_jacobian_fd():
    from functools import partial

    import tests_shim  # noqa: F401  (no-op import guard)
    from ic_gvins_tpu.solver import assembly

    win, truth, params, traj, lms, invd = build_gvins_window(n_nodes=6, n_landmarks=24, seed=21)
    cfg = default_cfg()
    # find a valid observation pair (landmark l, node k != ref)
    m = np.asarray(assembly.obs_mask(win))
    ls, ks = np.nonzero(m)
    l, k = int(ls[0]), int(ks[0])
    fn = partial(assembly._reproj_res, win, cfg, l, k)
    z = jnp.zeros(20)
    J = jax.jacfwd(fn)(z)
    for i in range(20):
        eps = 1e-6
        e = jnp.zeros(20).at[i].set(eps)
        fd = (fn(e) - fn(-e)) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, atol=2e-4, rtol=1e-4)


def test_gvins_window_converges_and_recovers_depth():
    n = 8
    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=n, n_landmarks=48, seed=22
    )
    cfg = default_cfg()
    win_pert = perturb_window(win, n, jax.random.PRNGKey(5), dp=0.2, dth=0.005, dv=0.05)
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    win_opt, (s1, s2, ncull) = lm.optimize(win_pert, prior, cfg, params, iters=20)

    assert float(s2.cost1) < float(s1.cost0) * 0.05
    perr = jnp.linalg.norm(win_opt.nodes.p[:n] - truth.p, axis=-1)
    assert float(perr.max()) < 0.15, perr
    dq = rot.quat_mul(rot.quat_inv(win_opt.nodes.q[:n]), truth.q)
    aerr = jnp.linalg.norm(jax.vmap(rot.quat_to_rotvec)(dq), axis=-1)
    assert float(aerr.max()) < 0.02, aerr

    # landmark inverse depths must move toward truth for well-observed ones
    from ic_gvins_tpu.solver import assembly

    nobs = jnp.sum(assembly.obs_mask(win_opt), axis=1)
    good = np.asarray((nobs >= 3) & win_opt.lm_valid)
    est = np.asarray(win_opt.lm_invdepth)[good]
    tru = np.asarray(invd_truth)[good]
    rel = np.abs(est - tru) / tru
    assert np.median(rel) < 0.05, (np.median(rel), rel)


def test_gvins_beats_gins_with_sparse_gnss():
    """With GNSS only every 3rd node, vision must reduce the position error
    at GNSS-less nodes."""
    n = 8
    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=n, n_landmarks=48, gnss_every=3, seed=23
    )
    cfg = default_cfg()
    pose_std, mix_std = std_priors()

    win_pert = perturb_window(win, n, jax.random.PRNGKey(6), dp=0.3, dth=0.01, dv=0.1)
    prior = make_init_prior(win, pose_std, mix_std)

    win_v, _ = lm.optimize(win_pert, prior, cfg, params, iters=20)
    win_novis = win_pert._replace(lm_valid=jnp.zeros_like(win_pert.lm_valid))
    win_g, _ = lm.optimize(win_novis, prior, cfg, params, iters=20)

    no_gnss = ~np.asarray(win.gnss_valid)[:n]
    perr_v = np.linalg.norm(np.asarray(win_v.nodes.p[:n] - truth.p), axis=-1)[no_gnss]
    perr_g = np.linalg.norm(np.asarray(win_g.nodes.p[:n] - truth.p), axis=-1)[no_gnss]
    assert perr_v.mean() <= perr_g.mean() + 1e-6, (perr_v, perr_g)
    assert perr_v.max() < 0.2
