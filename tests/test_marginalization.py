import jax
import jax.numpy as jnp
import numpy as np

from helpers import build_gins_window, default_cfg, perturb_window

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.factors import marginalization as marg
from ic_gvins_tpu.solver import lm
from ic_gvins_tpu.solver.window import make_init_prior


def std_priors():
    pose_std = jnp.array([0.1] * 3 + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    return pose_std, mix_std


def test_prior_preserves_information():
    """After marginalizing node 0, optimizing the rest must give ~the same
    estimate as optimizing the full window (information is preserved)."""
    n = 6
    win, truth, params, _ = build_gins_window(n_nodes=n, gnss_std=0.05, seed=11)
    cfg = default_cfg()
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    # converge the full window first
    win_opt, _ = lm.optimize(win, prior, cfg, params, iters=15)

    # marginalize node 0 and slide
    win2, prior2 = marg.marginalize_and_slide(win_opt, prior, cfg, params)
    assert bool(win2.node_valid[n - 2]) and not bool(win2.node_valid[n - 1])

    # re-optimize the slid window; the shared nodes must barely move
    win2_opt, _ = lm.optimize(win2, prior2, cfg, params, iters=10)
    for i in range(n - 1):
        dp = jnp.linalg.norm(win2_opt.nodes.p[i] - win_opt.nodes.p[i + 1])
        assert float(dp) < 2e-2, (i, float(dp))


def test_prior_residual_zero_at_linearization():
    n = 5
    win, truth, params, _ = build_gins_window(n_nodes=n, seed=12)
    cfg = default_cfg()
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)
    win_opt, _ = lm.optimize(win, prior, cfg, params, iters=10)
    win2, prior2 = marg.marginalize_and_slide(win_opt, prior, cfg, params)

    # At the linearization point the prior gradient equals the stored g0,
    # which approximates the true marginal gradient: for a converged
    # window it must be small relative to the prior's information scale.
    from ic_gvins_tpu.solver.assembly import eval_prior

    H0, g, _ = eval_prior(win2, prior2)
    assert float(jnp.linalg.norm(g)) < 10.0 * float(
        jnp.linalg.norm(jnp.diag(H0))) ** 0.5


def test_prior_anchors_attitude_after_sliding():
    """Sliding a converged window repeatedly must not lose the attitude/bias
    anchoring: the estimate should stay near truth with only GNSS+IMU."""
    n = 6
    win, truth, params, _ = build_gins_window(n_nodes=n, gnss_std=0.05, seed=13)
    cfg = default_cfg()
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)
    win_opt, _ = lm.optimize(win, prior, cfg, params, iters=15)

    w, p = win_opt, prior
    for _ in range(3):
        w, p = marg.marginalize_and_slide(w, p, cfg, params)
        w, _ = lm.optimize(w, p, cfg, params, iters=8)

    k = n - 4  # first still-valid original node index after 3 slides
    valid = int(jnp.sum(w.node_valid))
    assert valid == n - 3
    perr = jnp.linalg.norm(w.nodes.p[:valid] - truth.p[3 : 3 + valid], axis=-1)
    assert float(perr.max()) < 0.2, perr
    dq = rot.quat_mul(rot.quat_inv(w.nodes.q[:valid]), truth.q[3 : 3 + valid])
    aerr = jnp.linalg.norm(jax.vmap(rot.quat_to_rotvec)(dq), axis=-1)
    assert float(aerr.max()) < 0.03, aerr


def test_prior_matches_exact_schur_complement():
    """The prior's implied gradient/Hessian must equal the EXACT Schur
    complement of the marginalized factor system (regression for the
    round-1 bug where the Hessian correction term was masked to zero and
    the prior kept the full uneliminated ~1e10 bias-link information)."""
    import numpy as np
    from ic_gvins_tpu.solver.window import empty_prior

    n = 4
    win, truth, params, _ = build_gins_window(n_nodes=n, gnss_std=0.05, seed=3)
    cfg = default_cfg()
    win = perturb_window(win, n, jax.random.PRNGKey(1), dp=0.02, dth=0.001,
                         dv=0.01)
    prior0 = empty_prior(win.n_nodes)
    H, g = marg._marg_system(win, prior0, cfg, params, include_prior=False)
    D, DX = win.dim_total, win.dim_x
    m = np.zeros(D)
    m[:15] = 1.0
    Mi, Ri = np.nonzero(m)[0], np.nonzero(1 - m)[0]
    H, g = np.asarray(H), np.asarray(g)
    Hmm_inv = np.linalg.pinv(H[np.ix_(Mi, Mi)])
    Hp_true = H[np.ix_(Ri, Ri)] - H[np.ix_(Ri, Mi)] @ Hmm_inv @ H[np.ix_(Mi, Ri)]
    gp_true = g[Ri] - H[np.ix_(Ri, Mi)] @ Hmm_inv @ g[Mi]

    pr = marg.marginalize_node0(win, prior0, cfg, params)
    Hp, gp = np.asarray(pr.H), np.asarray(pr.g)
    idx = np.arange(15, DX)
    scale = np.abs(Hp_true).max()
    np.testing.assert_allclose(gp[idx], gp_true[: DX - 15],
                               atol=1e-4 * max(np.abs(gp_true).max(), 1.0))
    np.testing.assert_allclose(
        Hp[np.ix_(idx, idx)], Hp_true[: DX - 15, : DX - 15],
        atol=1e-6 * scale,
    )
    # node-0 dims must carry no residual information
    assert np.abs(Hp[:15]).max() < 1e-9 * scale
