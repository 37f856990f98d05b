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

    # At the linearization point the prior residual equals e0, and the
    # gradient J0^T e0 approximates the true marginal gradient: for a
    # converged window it must be small relative to the prior's scale.
    from ic_gvins_tpu.solver.assembly import eval_prior

    r, J = eval_prior(win2, prior2)
    g = J.T @ r
    assert float(jnp.linalg.norm(g)) < 10.0 * float(jnp.linalg.norm(jnp.diag(J @ J.T))) ** 0.5


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
