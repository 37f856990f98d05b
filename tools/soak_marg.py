#!/usr/bin/env python
"""Marginalization soak: long synthetic run comparing prior modes.

Reproduces / monitors the long-run behavior of the reference-parity
accumulating Schur prior (``marg_prior_mode="full"``,
``marginalization_info.h:153-192``) against the bounded continuity anchor,
with an optional GNSS outage window — the scenario where the full prior's
cross-node history should pay off (bridging the outage) and where any
inconsistency compounds into drift.

Per-slide instrumentation: prior information spectrum (max/min nonzero
eigenvalue), the bias-block information mass, and the prior residual norm.

Usage:
    python tools/soak_marg.py --duration 300 --outage 120 180 --mode both
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def run_one(mode, args, forgetting=1.0):
    import numpy as np

    from test_estimator import run_sequence, small_cfg
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.estimator import Estimator

    cfg = small_cfg(marg_prior_mode=mode, prior_forgetting=forgetting)

    spectra = []
    orig = Estimator._marginalize_oldest

    def instrumented(self):
        orig(self)
        if len(spectra) % 5 == 0:
            Hp = np.asarray(self.prior.H)
            w = np.linalg.eigvalsh(0.5 * (Hp + Hp.T))
            nz = w[w > 1e-6]
            # bias-block information mass of node 0 (dims 9:15)
            bias_info = float(np.linalg.norm(Hp[9:15, 9:15]))
            spectra.append(dict(
                t=self.node_times[0] if self.node_times else 0.0,
                eig_max=float(nz.max()) if nz.size else 0.0,
                eig_min=float(nz.min()) if nz.size else 0.0,
                rank=int(nz.size),
                bias_info=bias_info,
            ))
        else:
            spectra.append(None)

    Estimator._marginalize_oldest = instrumented
    try:
        est, traj, params = run_sequence(
            cfg,
            duration=args.duration,
            with_vision=args.vision,
            gnss_std=args.gnss_std,
            gnss_outage=tuple(args.outage) if args.outage else None,
            seed=args.seed,
        )
    finally:
        Estimator._marginalize_oldest = orig

    import jax.numpy as jnp

    times, ps, _ = est.trajectory()
    errs, ts = [], []
    for t, p in zip(times, ps):
        if t < 5.0:
            continue
        s = sim.truth_state(traj, params, jnp.asarray(t))
        errs.append(float(np.linalg.norm(p - np.asarray(s.p))))
        ts.append(t)
    errs, ts = np.asarray(errs), np.asarray(ts)

    # 30 s binned max error (shows where drift accumulates)
    bins = {}
    for t, e in zip(ts, errs):
        bins.setdefault(int(t // 30) * 30, []).append(e)
    binned = {k: round(float(np.max(v)), 3) for k, v in sorted(bins.items())}

    sp = [s for s in spectra if s]
    return dict(
        mode=mode,
        ate_rmse=round(float(np.sqrt(np.mean(errs**2))), 4),
        ate_max=round(float(errs.max()), 4),
        binned_max=binned,
        n_marg=len(spectra),
        spectrum_first=sp[0] if sp else None,
        spectrum_last=sp[-1] if sp else None,
        eig_max_growth=[round(s["eig_max"], 1) for s in sp[:: max(1, len(sp) // 12)]],
        bias_info_growth=[round(s["bias_info"], 1) for s in sp[:: max(1, len(sp) // 12)]],
    )


def main():
    # XLA:CPU recurses deeply compiling the fused solver programs; the
    # default 8 MB main-thread stack overflows (see tests/conftest.py).
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = 512 * 1024 * 1024
        if hard == resource.RLIM_INFINITY or hard >= want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=300.0)
    ap.add_argument("--outage", type=float, nargs=2, default=None)
    ap.add_argument("--mode", default="both",
                    choices=("full", "anchor", "none", "both"))
    ap.add_argument("--gnss-std", type=float, default=0.05)
    ap.add_argument("--vision", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--forgetting", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    modes = ["full", "anchor"] if args.mode == "both" else [args.mode]
    for m in modes:
        out = run_one(m, args, forgetting=args.forgetting)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
