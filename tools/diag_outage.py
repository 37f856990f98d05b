#!/usr/bin/env python
"""Diagnose the outage-soak failure (VERDICT r2 weak #1): reproduce the
failing test_marg_soak scenario and attribute the error — pre-outage
calibration (attitude/bias error at outage entry), dead-reckoning drift
during the outage, and post-outage recovery dynamics (chi2 culling of the
returning fixes) — for the full-Schur vs anchor prior modes.

Usage: python tools/diag_outage.py [--mode both] [--seed 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def run_one(mode, args):
    import numpy as np
    import jax.numpy as jnp

    from test_estimator import run_sequence, small_cfg
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.common import rotation as rot

    cfg = small_cfg(marg_prior_mode=mode, chi2_compound=args.chi2_compound)
    t0, t1 = args.outage
    est, traj, params = run_sequence(
        cfg, duration=args.duration, with_vision=False,
        gnss_outage=(t0, t1), seed=args.seed,
    )

    times, ps, qs = est.trajectory()
    rows = []
    for t, p, q in zip(times, ps, qs):
        if t < 5.0:
            continue
        s = sim.truth_state(traj, params, jnp.asarray(t))
        perr = float(np.linalg.norm(p - np.asarray(s.p)))
        dq = rot.quat_mul(rot.quat_inv(jnp.asarray(q)), s.q)
        aerr = float(np.linalg.norm(np.asarray(rot.quat_to_rotvec(dq))))
        rows.append((float(t), perr, aerr))
    rows = np.asarray(rows)

    def seg(lo, hi):
        m = (rows[:, 0] >= lo) & (rows[:, 0] < hi)
        if not m.any():
            return None
        return dict(
            rmse=round(float(np.sqrt(np.mean(rows[m, 1] ** 2))), 3),
            max=round(float(rows[m, 1].max()), 3),
            att_deg_max=round(float(np.degrees(rows[m, 2].max())), 4),
        )

    # state error right at outage entry (last point before t0)
    pre = rows[rows[:, 0] < t0]
    entry = dict(
        pos_err=round(float(pre[-1, 1]), 4) if len(pre) else None,
        att_deg=round(float(np.degrees(pre[-1, 2])), 4) if len(pre) else None,
    )
    # bias error at the last node (vs the simulated truth biases)
    bg_true = np.array([2e-4, -1e-4, 3e-4])
    ba_true = np.array([5e-3, -8e-3, 2e-3])
    s_last = est.last_node_state
    bias = dict(
        bg_err=round(float(np.linalg.norm(np.asarray(s_last.bg) - bg_true)), 6),
        ba_err=round(float(np.linalg.norm(np.asarray(s_last.ba) - ba_true)), 5),
    )
    # post-outage GNSS std inflation (culled fixes keep scale > 1)
    w = est.window
    gs = np.asarray(w.gnss_std)
    gb = np.asarray(w.gnss_std_base)
    gv = np.asarray(w.gnss_valid)
    infl = [round(float(gs[i].mean() / max(gb[i].mean(), 1e-9)), 1)
            for i in range(len(gv)) if gv[i]]

    return dict(
        mode=mode,
        chi2_compound=args.chi2_compound,
        pre_outage=seg(5.0, t0),
        outage=seg(t0, t1),
        recovery=seg(t1, args.duration),
        entry_state=entry,
        final_bias_err=bias,
        final_gnss_inflation=infl,
        overall_rmse=round(float(np.sqrt(np.mean(rows[:, 1] ** 2))), 3),
        overall_max=round(float(rows[:, 1].max()), 3),
    )


def main():
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = 512 * 1024 * 1024
        if hard == resource.RLIM_INFINITY or hard >= want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--outage", type=float, nargs=2, default=(60.0, 90.0))
    ap.add_argument("--mode", default="both",
                    choices=("full", "anchor", "none", "both"))
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--chi2-compound", action="store_true", default=True)
    ap.add_argument("--no-chi2-compound", dest="chi2_compound",
                    action="store_false")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    modes = ["full", "anchor"] if args.mode == "both" else [args.mode]
    for m in modes:
        print(json.dumps(run_one(m, args)), flush=True)


if __name__ == "__main__":
    main()
