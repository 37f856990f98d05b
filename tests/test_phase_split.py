"""Opt-in per-phase solver timing (VERDICT r4 #8).

The reference records optimize#1 / optimize#2 / marginalization wall
separately (``ic_gvins.cc:1054-1056``); the TPU build fuses both phases
into one program by default, so the split is an opt-in mode
(``EngineConfig.stat_phase_split``) that runs the phases as two synced
programs. These tests pin (a) the split programs compute the same round
as the fused one and (b) the statistics rows carry the measured columns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.solver import lm as lm_mod
from ic_gvins_tpu.solver.window import empty_prior

from helpers import build_gvins_window, default_cfg, perturb_window


def test_split_phases_match_fused_round():
    win, truth, params, traj, lms, invd = build_gvins_window(
        n_nodes=8, n_landmarks=32, seed=3
    )
    win = perturb_window(win, 8, jax.random.PRNGKey(7))
    cfg = default_cfg()
    prior = empty_prior(win.n_nodes)

    w_fused, (s1, s2, ncull) = lm_mod.optimize(
        win, prior, cfg, params, iters=12, do_cull=True
    )
    w1, s1p, ncull_p = lm_mod.optimize_phase1(win, prior, cfg, params, iters=12)
    w_split, s2p = lm_mod.optimize_phase2(w1, prior, cfg, params, iters=12)

    assert int(ncull) == int(ncull_p)
    np.testing.assert_allclose(
        np.asarray(w_split.nodes.p[:8]), np.asarray(w_fused.nodes.p[:8]),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(w_split.nodes.q[:8]), np.asarray(w_fused.nodes.q[:8]),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(w_split.lm_invdepth), np.asarray(w_fused.lm_invdepth),
        atol=1e-8,
    )


def test_stat_phase_split_columns_in_statistics(tmp_path):
    """GINS-only engine run with the split enabled: every stats row must
    carry measured timecost_opt1_ms/timecost_opt2_ms (plus the always-on
    total + marginalization columns), and statistics.txt round-trips."""
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.config import EngineConfig
    from ic_gvins_tpu.engine.estimator import Estimator
    from ic_gvins_tpu.engine.outputs import RunWriter

    cfg = EngineConfig(
        optimize_num_iterations=8, max_nodes=12, max_landmarks=8,
        optimize_windows_size=6, antlever=(0.0, 0.0, 0.0),
        stat_phase_split=True,
    )
    params = sim.default_params(with_earth=True, lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory(speed=5.0)
    key = jax.random.PRNGKey(1)
    ki, kg = jax.random.split(key)
    duration = 14.0
    imu = sim.simulate_imu(traj, params, 0.0, duration, 100.0)
    imu = sim.corrupt_imu(
        imu, params, ki,
        jnp.array([2e-4, -1e-4, 3e-4]), jnp.array([5e-3, -8e-3, 2e-3]),
    )
    gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration, 1.0,
                             std=0.05, key=kg)
    est = Estimator(cfg)
    gi = 0
    gt = np.asarray(gnss.time)
    for k in range(imu.n):
        dt = float(imu.dt[k])
        if dt == 0.0:
            continue
        t = float(imu.time[k])
        est.add_imu(t, dt, np.asarray(imu.dtheta[k]), np.asarray(imu.dvel[k]))
        while gi < len(gt) and gt[gi] <= t:
            est.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]),
                         np.asarray(gnss.std[gi]))
            gi += 1
    assert len(est.stats) >= 3
    writer = RunWriter(str(tmp_path))
    post_warmup = 0
    for row in est.stats:
        assert "timecost_opt1_ms" in row and "timecost_opt2_ms" in row
        assert row["timecost_opt1_ms"] >= 0.0
        if row["timecost_opt2_ms"] > 0.0:
            post_warmup += 1  # genuinely split (non-warm-up) round
        writer.write_statistics(row)
    writer.close()
    assert post_warmup >= 1
    with open(tmp_path / "statistics.txt") as f:
        header = f.readline().lstrip("# ").split()
        n_rows = sum(1 for _ in f)
    for col in ("timecost_ms", "timecost_marg_ms",
                "timecost_opt1_ms", "timecost_opt2_ms"):
        assert col in header
    assert n_rows == len(est.stats)
