"""Pallas TPU kernel for batched pyramidal Lucas-Kanade tracking.

TPU-native design (vs the pure-JAX reference implementation in ``klt.py``,
which lowers to per-feature HBM gathers):

* grid = one program per feature; the feature's coordinates arrive via
  scalar prefetch (SMEM) so the kernel can compute DMA indices,
* each program DMAs one aligned search window per image (64 x 128 f32 =
  32 KB) from HBM into VMEM scratch — one sequential burst instead of
  thousands of random gathers,
* bilinear patch sampling is expressed as a blend of four statically-shaped
  dynamic slices of the VMEM window (VPU-friendly, no gather),
* the LK normal equations (2x2) are solved in scalar registers; the
  iteration loop is a fixed-trip ``fori_loop`` with a convergence freeze.

The public entry ``lk_track_pallas`` mirrors ``klt.lk_track`` and is used
by the front-end when running on TPU; CPU tests exercise it in interpreter
mode for parity with the pure-JAX tracker.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 21
HALF = WIN // 2
MAX_ITERS = 30
EPS_STEP = 0.01
MIN_EIG = 1e-4

# VMEM search window per feature (rows x lanes). 64 x 128 covers ~±20 px
# vertical and ~±50 px horizontal slack around the initial guess.
RROWS = 64
RCOLS = 128
_CY = RROWS // 2
_CX = RCOLS // 2


def _bilinear_patch(win, iy, ix, ay, ax, size):
    """size x size patch at integer corner (iy, ix) + fractional (ay, ax),
    as a 4-slice blend (all slices statically shaped)."""
    p00 = win[pl.ds(iy, size), pl.ds(ix, size)]
    p01 = win[pl.ds(iy, size), pl.ds(ix + 1, size)]
    p10 = win[pl.ds(iy + 1, size), pl.ds(ix, size)]
    p11 = win[pl.ds(iy + 1, size), pl.ds(ix + 1, size)]
    return (
        p00 * (1 - ay) * (1 - ax)
        + p01 * (1 - ay) * ax
        + p10 * ay * (1 - ax)
        + p11 * ay * ax
    )


def _split(v, lo, hi):
    """float coord -> (clamped int corner, fraction) for a patch of HALF
    reach inside the window."""
    i = jnp.floor(v).astype(jnp.int32)
    i = jnp.clip(i, lo, hi)
    return i, v - i.astype(jnp.float32)


def _kernel(pts_ref, img0_ref, img1_ref, out_pts_ref, out_ok_ref,
            win0, win1, sem, *, rrows, rcols):
    f = pl.program_id(0)
    h = img0_ref.shape[0]
    w = img0_ref.shape[1]
    cy, cx = rrows // 2, rcols // 2

    x0 = pts_ref[f, 0]
    y0 = pts_ref[f, 1]
    x1 = pts_ref[f, 2]
    y1 = pts_ref[f, 3]

    def clamp_base(c, center, dim, span):
        b = jnp.round(c).astype(jnp.int32) - center
        return jnp.clip(b, 0, dim - span)

    bx0 = clamp_base(x0, cx, w, rcols)
    by0 = clamp_base(y0, cy, h, rrows)
    bx1 = clamp_base(x1, cx, w, rcols)
    by1 = clamp_base(y1, cy, h, rrows)

    dma0 = pltpu.make_async_copy(
        img0_ref.at[pl.ds(by0, rrows), pl.ds(bx0, rcols)], win0, sem.at[0]
    )
    dma1 = pltpu.make_async_copy(
        img1_ref.at[pl.ds(by1, rrows), pl.ds(bx1, rcols)], win1, sem.at[1]
    )
    dma0.start()
    dma1.start()
    dma0.wait()
    dma1.wait()

    # --- template patch + gradients in win0 local coords ---
    lx0 = x0 - bx0.astype(jnp.float32)
    ly0 = y0 - by0.astype(jnp.float32)
    # gradient patch needs one extra ring: corner at (iy-1, ix-1), size 23
    ix0, ax0 = _split(lx0 - HALF, 1, rcols - WIN - 2)
    iy0, ay0 = _split(ly0 - HALF, 1, rrows - WIN - 2)
    big = _bilinear_patch(win0, iy0 - 1, ix0 - 1, ay0, ax0, WIN + 2)
    t = big[1:-1, 1:-1]
    gx = 0.5 * (big[1:-1, 2:] - big[1:-1, :-2])
    gy = 0.5 * (big[2:, 1:-1] - big[:-2, 1:-1])

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (WIN * WIN)
    good = min_eig > MIN_EIG
    inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

    # --- iterate in win1 local coords ---
    lx1 = x1 - bx1.astype(jnp.float32)
    ly1 = y1 - by1.astype(jnp.float32)

    in0 = (
        (x0 >= HALF + 1) & (x0 <= w - HALF - 2)
        & (y0 >= HALF + 1) & (y0 <= h - HALF - 2)
    )

    def in_bounds_local(px, py):
        return (
            (px >= HALF) & (px <= rcols - HALF - 2)
            & (py >= HALF) & (py <= rrows - HALF - 2)
        )

    def body(_, carry):
        px, py, done = carry
        ix, ax = _split(px - HALF, 0, rcols - WIN - 1)
        iy, ay = _split(py - HALF, 0, rrows - WIN - 1)
        patch = _bilinear_patch(win1, iy, ix, ay, ax, WIN)
        diff = patch - t
        b1 = jnp.sum(diff * gx)
        b2 = jnp.sum(diff * gy)
        dx = -inv * (gyy * b1 - gxy * b2)
        dy = -inv * (gxx * b2 - gxy * b1)
        step_ok = in_bounds_local(px + dx, py + dy)
        frozen = done | ~step_ok
        px_n = jnp.where(frozen, px, px + dx)
        py_n = jnp.where(frozen, py, py + dy)
        done_n = done | (dx * dx + dy * dy < EPS_STEP * EPS_STEP) | ~step_ok
        return px_n, py_n, done_n

    ok0 = good & in0 & in_bounds_local(lx1, ly1)
    px, py, _ = jax.lax.fori_loop(
        0, MAX_ITERS, body, (lx1, ly1, ~ok0)
    )

    gx1 = px + bx1.astype(jnp.float32)
    gy1 = py + by1.astype(jnp.float32)
    ok = ok0 & (gx1 >= HALF) & (gx1 <= w - 1 - HALF) & (gy1 >= HALF) & (gy1 <= h - 1 - HALF)

    # per-feature scalar results go to SMEM (VMEM blocks would need
    # (8,128)-aligned tiles; scalars belong in SMEM anyway)
    out_pts_ref[f, 0] = gx1
    out_pts_ref[f, 1] = gy1
    out_ok_ref[f, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _track_level_pallas(img0, img1, pts4, interpret=False):
    n = pts4.shape[0]
    # search-window footprint adapts to small pyramid levels
    rrows = min(RROWS, img0.shape[0])
    rcols = min(RCOLS, img0.shape[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rrows, rcols), jnp.float32),
            pltpu.VMEM((rrows, rcols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_pts, out_ok = pl.pallas_call(
        functools.partial(_kernel, rrows=rrows, rcols=rcols),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pts4, img0, img1)
    return out_pts, out_ok[:, 0] > 0


def lk_track_pallas(pyr0, pyr1, pts0, pts1_init, valid, interpret=False):
    """Pyramidal LK over all levels; same contract as ``klt.lk_track``."""
    levels = len(pyr0)
    pts0 = pts0.astype(jnp.float32)
    pts1 = pts1_init.astype(jnp.float32) / (2.0 ** (levels - 1))
    ok = valid
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        if lv < levels - 1:
            pts1 = pts1 * 2.0
        pts4 = jnp.concatenate([pts0 / s, pts1], axis=1)
        pts1_new, ok_lv = _track_level_pallas(
            pyr0[lv], pyr1[lv], pts4, interpret=interpret
        )
        pts1 = pts1_new
        if lv == 0:
            ok = ok & ok_lv
    return pts1, ok


def lk_track_bidirectional_pallas(pyr0, pyr1, pts0, pts1_init, valid,
                                  fb_thresh=0.5, interpret=False):
    pts1, ok_f = lk_track_pallas(pyr0, pyr1, pts0, pts1_init, valid, interpret)
    pts0_back, ok_b = lk_track_pallas(pyr1, pyr0, pts1, pts0, ok_f, interpret)
    fb = jnp.linalg.norm(pts0_back - pts0.astype(jnp.float32), axis=-1)
    return pts1, ok_f & ok_b & (fb < fb_thresh), fb
