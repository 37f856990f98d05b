"""Benchmark: full GVINS sliding-window optimization rounds on TPU.

Measures the flagship hot path — the two-phase LM optimization round
(assemble + Schur + update, 20 iterations) on a production-size window
(12 nodes x 192 landmarks), batched over independent sequences (the
data-parallel replay mode). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/10}

Baseline: the reference is "real-time" on a desktop CPU at the KAIST camera
rate of 10 fps (BASELINE.md) — one optimization round per keyframe. So
frames/s here = optimization rounds/s, and vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 8
N_NODES = 12
N_LANDMARKS = 192
ITERS = 20
REFERENCE_FPS = 10.0


def main():
    from __graft_entry__ import _tiny_problem
    from ic_gvins_tpu.parallel.multi_seq import (
        optimize_batch,
        stack_priors,
        stack_windows,
    )

    dtype = jnp.float32
    wins, prs = [], []
    for s in range(BATCH):
        w, p, cfg, params = _tiny_problem(
            n_nodes=N_NODES, n_landmarks=N_LANDMARKS, dtype=dtype, seed=s
        )
        wins.append(w)
        prs.append(p)
    bw, bp = stack_windows(wins), stack_priors(prs)

    out, (c0, c1, _) = optimize_batch(bw, bp, cfg, params, iters=ITERS)
    jax.block_until_ready(out.nodes.p)  # compile + warm-up
    # numerics guard: the benchmark only counts if the solve is real —
    # finite costs, decreasing, and finite states in f32 on TPU
    import numpy as np

    c0v, c1v = np.asarray(c0), np.asarray(c1)
    assert np.all(np.isfinite(c0v)) and np.all(np.isfinite(c1v)), (c0v, c1v)
    assert np.all(np.isfinite(np.asarray(out.nodes.p)))
    # phase-1 cost (with robust kernel) vs phase-2 (GNSS kernel dropped)
    # aren't directly comparable; just require the solve stays bounded
    assert np.all(c1v < 1e4), c1v

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out, _ = optimize_batch(bw, bp, cfg, params, iters=ITERS)
    jax.block_until_ready(out.nodes.p)
    dt = (time.perf_counter() - t0) / n_rep

    frames_per_s = BATCH / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"frames/s/chip (GVINS sliding-window optimization round, "
                    f"{N_NODES} nodes x {N_LANDMARKS} landmarks, {ITERS} LM iters, "
                    f"batch {BATCH} sequences)"
                ),
                "value": round(frames_per_s, 3),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_s / REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
