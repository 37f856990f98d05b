#!/usr/bin/env python
"""A/B the LK formulations on the real chip: per-feature Pallas kernel vs
the MXU two-hot-matmul batch, bidirectional, batch 8 x 256 features.
Also cross-checks that both produce the same tracks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
N_FEATURES = 256
IMG_H, IMG_W = 256, 320


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from ic_gvins_tpu.vision import klt, klt_pallas, pyramid

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
        rng.rand(N_FEATURES, 2) * np.array([IMG_W - 60, IMG_H - 60]) + 30,
        jnp.float32,
    )
    valid = jnp.ones(N_FEATURES, bool)
    bpts = jnp.stack([pts + 0.1 * b for b in range(BATCH)])

    @jax.jit
    def f_pallas(bpts):
        out, ok, _ = jax.vmap(
            lambda p0: klt_pallas.lk_track_bidirectional_pallas(
                pyr0, pyr1, p0, p0, valid
            )
        )(bpts)
        return out, ok

    @jax.jit
    def f_matmul(bpts):
        out, ok, _ = jax.vmap(
            lambda p0: klt.lk_track_bidirectional_matmul(
                pyr0, pyr1, p0, p0, valid
            )
        )(bpts)
        return out, ok

    t0 = time.perf_counter()
    tp, (out_p, ok_p) = timed(f_pallas, bpts)
    cp = time.perf_counter() - t0
    t0 = time.perf_counter()
    tm, (out_m, ok_m) = timed(f_matmul, bpts)
    cm = time.perf_counter() - t0
    print(f"pallas : {tp:7.2f} ms  (compile+reps {cp:.1f} s)")
    print(f"matmul : {tm:7.2f} ms  (compile+reps {cm:.1f} s)")

    both = np.asarray(ok_p & ok_m)
    dp = np.linalg.norm(np.asarray(out_p) - np.asarray(out_m), axis=-1)
    print(f"ok pallas {int(np.asarray(ok_p).sum())} matmul "
          f"{int(np.asarray(ok_m).sum())} both {int(both.sum())}")
    print(f"track diff (both-ok): max {dp[both].max():.4f} px, "
          f"mean {dp[both].mean():.4f} px")
    # true shift is (3, 2): check accuracy of each
    err_p = np.linalg.norm(np.asarray(out_p) - (np.asarray(bpts) + np.array([3.0, 2.0])), axis=-1)
    err_m = np.linalg.norm(np.asarray(out_m) - (np.asarray(bpts) + np.array([3.0, 2.0])), axis=-1)
    print(f"err vs truth: pallas {err_p[np.asarray(ok_p)].mean():.4f} px, "
          f"matmul {err_m[np.asarray(ok_m)].mean():.4f} px")


if __name__ == "__main__":
    main()
