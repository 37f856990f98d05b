"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from helpers import build_gvins_window, default_cfg, perturb_window

from ic_gvins_tpu.parallel import multi_seq, schur
from ic_gvins_tpu.solver import assembly, lm
from ic_gvins_tpu.solver.window import make_init_prior


def std_priors():
    pose_std = jnp.array([0.1] * 3 + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    return pose_std, mix_std


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("lm",))


def test_sharded_gn_step_matches_single_device(mesh):
    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=8, n_landmarks=48, seed=31
    )
    cfg = default_cfg()
    win_p = perturb_window(win, 8, jax.random.PRNGKey(3), dp=0.05, dth=0.002, dv=0.02)
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    lam = 1e-4
    # single-device reference step
    H, g, _ = assembly.assemble(
        win_p, prior, cfg, params,
        assembly.RobustFlags(jnp.asarray(True), jnp.asarray(True)),
    )
    dx = assembly.schur_solve(H, g, win_p.dim_x, lam)
    from ic_gvins_tpu.solver.window import apply_delta

    ref = apply_delta(win_p, dx)

    out = schur.sharded_gn_step(win_p, prior, cfg, params, mesh, lam=lam)

    np.testing.assert_allclose(out.nodes.p, ref.nodes.p, atol=2e-5)
    np.testing.assert_allclose(out.nodes.v, ref.nodes.v, atol=2e-5)
    # landmark updates match where free
    free = np.asarray(
        win_p.lm_valid & (jnp.sum(assembly.obs_mask(win_p), axis=1) > 0)
    )
    np.testing.assert_allclose(
        np.asarray(out.lm_invdepth)[free], np.asarray(ref.lm_invdepth)[free],
        atol=1e-5,
    )


def test_multi_sequence_batch_matches_sequential(mesh):
    wins, prs = [], []
    for seed in (41, 42):
        win, truth, params, traj, lms, invd = build_gvins_window(
            n_nodes=6, n_landmarks=24, seed=seed
        )
        cfg = default_cfg()
        pose_std, mix_std = std_priors()
        wins.append(perturb_window(win, 6, jax.random.PRNGKey(seed), dp=0.1))
        prs.append(make_init_prior(win, pose_std, mix_std))

    batch_w = multi_seq.stack_windows(wins)
    batch_p = multi_seq.stack_priors(prs)
    out, (c0, c1, *_) = multi_seq.optimize_batch(batch_w, batch_p, cfg, params, iters=8)

    for i in range(2):
        ref, _ = lm.optimize(wins[i], prs[i], cfg, params, iters=8)
        np.testing.assert_allclose(
            np.asarray(out.nodes.p[i]), np.asarray(ref.nodes.p), atol=1e-8
        )
        assert float(c1[i]) < float(c0[i])


def test_sharded_two_phase_lm_matches_single_device(mesh):
    """The engine's REAL round (two-phase LM with accept/reject + chi2
    cull) at production shapes, 1 device vs 8-device landmark sharding.
    VERDICT r1 #3: multi-chip must run the same algorithm as one chip."""
    from ic_gvins_tpu.parallel import lm_sharded

    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=24, n_landmarks=192, node_dt=0.25, seed=71
    )
    cfg = default_cfg()
    win_p = perturb_window(win, 24, jax.random.PRNGKey(5), dp=0.05,
                           dth=0.002, dv=0.02)
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    ref, (r1, r2, nc_ref) = lm.optimize(win_p, prior, cfg, params,
                                        iters=20, do_cull=True)
    out, (s1, s2, nc) = lm_sharded.optimize_sharded(
        win_p, prior, cfg, params, mesh, iters=20, do_cull=True
    )

    # identical control flow: same culls, same accepted-step counts
    assert int(nc) == int(nc_ref)
    assert int(s1.accepted) == int(r1.accepted)
    assert int(s2.accepted) == int(r2.accepted)
    np.testing.assert_allclose(float(s2.cost1), float(r2.cost1),
                               rtol=1e-8, atol=0)

    np.testing.assert_allclose(np.asarray(out.nodes.p),
                               np.asarray(ref.nodes.p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.nodes.v),
                               np.asarray(ref.nodes.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.nodes.q),
                               np.asarray(ref.nodes.q), atol=1e-6)
    free = np.asarray(
        win_p.lm_valid & (jnp.sum(assembly.obs_mask(win_p), axis=1) > 0)
    )
    np.testing.assert_allclose(
        np.asarray(out.lm_invdepth)[free], np.asarray(ref.lm_invdepth)[free],
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(out.obs_valid),
                                  np.asarray(ref.obs_valid))


def test_engine_rounds_with_mesh_match_single_device(mesh):
    """Estimator.set_mesh: a full engine run (init, nodes, rounds,
    marginalization) with the landmark-sharded solver tracks the
    single-program run."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_estimator import run_sequence, small_cfg

    kw = dict(duration=10.0, with_vision=True, n_landmarks=48,
              frame_rate=5.0, seed=3)
    est_ref, traj, params = run_sequence(small_cfg(), **kw)
    est_sh, _, _ = run_sequence(small_cfg(), mesh=mesh, **kw)

    t_r, p_r, _ = est_ref.trajectory()
    t_s, p_s, _ = est_sh.trajectory()
    assert len(t_r) == len(t_s)
    np.testing.assert_allclose(p_s, p_r, atol=1e-4)


@pytest.mark.slow
def test_sharded_cull_decisions_stay_identical_over_many_rounds(mesh):
    """VERDICT r2 #9: a single divergent chi2 cull between the sharded and
    single-device paths would compound silently over a long run. Feed the
    SAME window through >=50 consecutive two-phase rounds on both paths
    (re-perturbing each round so culling keeps firing) and assert the cull
    masks stay identical and the GNSS inflations stay numerically equal."""
    from ic_gvins_tpu.parallel import lm_sharded

    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=5, n_landmarks=16, seed=91
    )
    cfg = default_cfg()
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    n_cull_rounds = 0
    for r in range(50):
        # fresh perturbation each trial: 50 independent points on the cull
        # decision surface (feeding culled state forward would empty the
        # masks and make later rounds vacuous). Gross outliers injected
        # into a rotating subset of observations + one GNSS fix so the
        # chi2 gates actually fire.
        key = jax.random.PRNGKey(1000 + r)
        w0 = perturb_window(win, 5, key, dp=0.05 + 0.01 * (r % 5),
                            dth=0.003, dv=0.02)
        l_bad = r % w0.n_landmarks
        k_bad = r % (w0.n_nodes - 1) + 1
        w0 = w0._replace(
            obs_uv=w0.obs_uv.at[l_bad, :, 0].add(0.03 + 0.002 * (r % 7)),
            gnss_p=w0.gnss_p.at[k_bad, 1].add(0.8 + 0.05 * (r % 5)),
        )
        w_ref, (_, _, nc_r) = lm.optimize(w0, prior, cfg, params,
                                          iters=6, do_cull=True)
        w_sh, (_, _, nc_s) = lm_sharded.optimize_sharded(
            w0, prior, cfg, params, mesh, iters=6, do_cull=True
        )
        assert int(nc_r) == int(nc_s), (r, int(nc_r), int(nc_s))
        np.testing.assert_array_equal(
            np.asarray(w_sh.obs_valid), np.asarray(w_ref.obs_valid),
            err_msg=f"cull masks diverged at round {r}",
        )
        np.testing.assert_allclose(
            np.asarray(w_sh.gnss_std), np.asarray(w_ref.gnss_std),
            rtol=1e-9, atol=0, err_msg=f"GNSS inflation diverged at round {r}",
        )
        n_cull_rounds += int(int(nc_r) > 0)
    # the scenario must actually exercise culling, else the test is vacuous
    assert n_cull_rounds >= 3, n_cull_rounds
