"""Marginalization outage soak (short CI version of tools/soak_marg.py):
the reference-parity full Schur prior must match or beat the bounded
anchor across a GNSS outage — VERDICT r1 task #2's acceptance test.
"""

import pytest

from test_estimator import ate, run_sequence, small_cfg


@pytest.mark.slow
def test_full_prior_survives_outage_and_beats_anchor():
    # 60 s of GNSS before the outage so the biases converge (the 300 s
    # tool-level soak with a 120 s lead-in holds 0.06 m RMSE; with a short
    # lead-in the 30 s dead-reckoning stretch drifts meters for BOTH modes
    # — pure INS, reference behaves the same)
    kw = dict(duration=120.0, with_vision=False, gnss_outage=(60.0, 90.0),
              seed=2)
    est_f, traj, params = run_sequence(small_cfg(marg_prior_mode="full"), **kw)
    rmse_f, max_f = ate(est_f, traj, params, t_min=5.0)
    est_a, _, _ = run_sequence(small_cfg(marg_prior_mode="anchor"), **kw)
    rmse_a, max_a = ate(est_a, traj, params, t_min=5.0)
    print(f"outage soak: full rmse={rmse_f:.3f}/max={max_f:.3f}  "
          f"anchor rmse={rmse_a:.3f}/max={max_a:.3f}")
    # full must not catastrophically diverge (the round-1 bug gave 43 m
    # within the first minute even WITHOUT an outage), and must match or
    # beat the bounded-anchor workaround across the outage
    assert rmse_f < 5.0, f"full prior diverged: {rmse_f}"
    assert rmse_f < 1.2 * rmse_a + 0.05, (rmse_f, rmse_a)
