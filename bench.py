"""Benchmark: full GVINS frame pipeline on TPU.

Measures the two hot stages of a visual keyframe round on real hardware:

* bidirectional pyramidal KLT tracking (Pallas kernel, 256 features,
  4-level pyramid, 256x320 frames) for each sequence in the batch,
* the two-phase LM sliding-window optimization round (12 nodes x 192
  landmarks, 20 iterations) batched over the sequences,

fused into ONE jitted program (track -> optimize), and reports pipeline
frames/s/chip = batch / t_round.
Prints ONE JSON line. Baseline: the reference is "real-time" on a desktop
CPU at the KAIST camera rate of 10 fps (BASELINE.md), one optimization
round + one tracked frame per keyframe -> vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
N_NODES = 12
N_LANDMARKS = 192
ITERS = 20
N_FEATURES = 256
IMG_H, IMG_W = 256, 320
REFERENCE_FPS = 10.0


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    from __graft_entry__ import _tiny_problem
    from ic_gvins_tpu.parallel.multi_seq import (
        optimize_batch,
        stack_priors,
        stack_windows,
    )
    from ic_gvins_tpu.vision import klt_pallas, pyramid

    dtype = jnp.float32

    # --- stage 1: tracking ---
    # textured image (band-limited noise): white noise has gradient energy
    # only at the pixel scale, which makes LK convergence unrepresentative
    # of camera frames
    rng = np.random.RandomState(0)
    img0 = (rng.rand(IMG_H, IMG_W) * 255).astype(np.float32)
    try:
        from scipy.ndimage import gaussian_filter

        img0 = gaussian_filter(img0, 2.0) * 4.0
    except ImportError:
        pass
    img1 = np.roll(img0, (2, 3), axis=(0, 1))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray(
        rng.rand(N_FEATURES, 2) * np.array([IMG_W - 40, IMG_H - 40]) + 20,
        jnp.float32,
    )
    valid = jnp.ones(N_FEATURES, bool)

    # --- the window problem (one instance, tiled across the batch) ---
    w, p, cfg, params = _tiny_problem(
        n_nodes=N_NODES, n_landmarks=N_LANDMARKS, dtype=dtype, seed=0
    )
    tile = lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape)
    bw = jax.tree.map(tile, w)
    bp = jax.tree.map(tile, p)

    # --- fused frame round: per-sequence bidirectional KLT + batched
    # optimization, one jitted program (as a production pipeline step) ---
    # per-sequence feature sets (independent sequences -> batched tracking:
    # one kernel launch over BATCH x N_FEATURES features, like the
    # batched window optimization below)
    bpts = jnp.stack([pts + 0.1 * b for b in range(BATCH)])

    @jax.jit
    def frame_round(bpts, bw, bp):
        out, ok, _ = jax.vmap(
            lambda p0: klt_pallas.lk_track_bidirectional_pallas(
                pyr0, pyr1, p0, p0, valid
            )
        )(bpts)
        pts_out = jnp.nan_to_num(out)
        win_out, stats = optimize_batch.__wrapped__(
            bw, bp, cfg, params, iters=ITERS
        )
        return pts_out, win_out, stats

    t_round, (pts_out, out, (c0, c1, _)) = _time(frame_round, bpts, bw, bp)

    # numerics guard: only a real, bounded solve counts
    c0v, c1v = np.asarray(c0), np.asarray(c1)
    assert np.all(np.isfinite(c0v)) and np.all(np.isfinite(c1v)), (c0v, c1v)
    assert np.all(np.isfinite(np.asarray(out.nodes.p)))
    assert np.all(c1v < 1e4), c1v

    import sys

    print(f"# fused frame round: {t_round*1e3:.1f} ms (batch {BATCH})",
          file=sys.stderr)
    frames_per_s = BATCH / t_round
    print(
        json.dumps(
            {
                "metric": (
                    f"frames/s/chip, full GVINS frame round: bidirectional "
                    f"{N_FEATURES}-feature Pallas KLT + {ITERS}-iter LM window "
                    f"round ({N_NODES} nodes x {N_LANDMARKS} landmarks), "
                    f"batch {BATCH} sequences"
                ),
                "value": round(frames_per_s, 3),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_s / REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
