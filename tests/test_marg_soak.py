"""Marginalization outage soak (short CI version of tools/soak_marg.py):
the reference-parity full Schur prior must match or beat the bounded
anchor across a GNSS outage — VERDICT r1 task #2's acceptance test.
"""

import pytest

from test_estimator import ate, run_sequence, small_cfg


@pytest.mark.slow
def test_full_prior_survives_outage_and_beats_anchor():
    kw = dict(duration=90.0, with_vision=False, gnss_outage=(40.0, 70.0),
              seed=2)
    est_f, traj, params = run_sequence(small_cfg(marg_prior_mode="full"), **kw)
    rmse_f, max_f = ate(est_f, traj, params, t_min=5.0)
    est_a, _, _ = run_sequence(small_cfg(marg_prior_mode="anchor"), **kw)
    rmse_a, max_a = ate(est_a, traj, params, t_min=5.0)
    print(f"outage soak: full rmse={rmse_f:.3f}/max={max_f:.3f}  "
          f"anchor rmse={rmse_a:.3f}/max={max_a:.3f}")
    # full must not diverge, and must be at least competitive with anchor
    assert rmse_f < 1.0, f"full prior diverged: {rmse_f}"
    assert rmse_f < 1.5 * rmse_a + 0.05, (rmse_f, rmse_a)
