"""Pallas TPU kernel for batched pyramidal Lucas-Kanade tracking.

TPU-native design (vs the pure-JAX tracker in ``klt.py``, which lowers to
per-feature HBM gathers):

* grid = one program per feature; feature coordinates arrive via scalar
  prefetch (SMEM) so the kernel can compute DMA indices,
* each program DMAs one aligned search window per image (64 x 128 f32 =
  32 KB) from HBM into VMEM scratch — one sequential burst instead of
  thousands of random gathers,
* patch extraction is fully tile-aligned: a 32-row dynamic sublane slice,
  a dynamic lane rotate (``pltpu.roll``) for the column offset, and static
  rolls for the +-1 bilinear/gradient taps; reductions are masked to the
  21x21 window on the full (32, 128) tile (VPU-friendly, no unaligned
  vector loads),
* the LK normal equations (2x2) are solved in scalar registers; the
  iteration loop is a fixed-trip ``fori_loop`` with a convergence freeze.

Pyramid levels smaller than the (64, 128) footprint (the coarse top levels,
negligible compute) fall back to the pure-JAX tracker; level 0 — where all
the work is — always runs the Pallas path on TPU.
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

RROWS = 64  # VMEM search window rows per feature
RCOLS = 256  # VMEM search window lanes per feature (two 128-lane tiles)
TILE_R = 32  # aligned working-tile rows (multiple of 8)
TILE_C = 128  # aligned compute-tile lanes (patch + taps fit in 24)


def _mask(size):
    r = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    return ((r < size) & (c < size)).astype(jnp.float32)


def _aligned_block(win, iy, ix):
    """(TILE_R, RCOLS) tile whose [u, v] element is win[iy + u, ix + v]
    (valid for u < TILE_R - clip overflow, v < RCOLS - roll wrap; callers
    mask to the patch region). All accesses tile-aligned."""
    # Mosaic requires the dynamic sublane start to be 8-aligned: round the
    # base down to a multiple of 8 and absorb the remainder into the roll.
    iyb = jnp.clip((iy // 8) * 8, 0, RROWS - TILE_R)
    iyb = pl.multiple_of(iyb, 8)
    oy = iy - iyb
    rows = win[pl.ds(iyb, TILE_R), :]
    # pltpu.roll requires non-negative shifts: roll by (size - off) == -off
    rows = pltpu.roll(rows, (TILE_R - oy) % TILE_R, axis=0)
    # after the lane roll the patch occupies lanes [0, 24); keep one
    # 128-lane tile for all downstream VPU work (2x less elementwise math)
    return pltpu.roll(rows, (RCOLS - ix) % RCOLS, axis=1)[:, :TILE_C]


def _bilinear_tile(block, ay, ax):
    """Full-tile bilinear blend: out[u,v] = bilinear(block at (u+ay, v+ax))."""
    b01 = pltpu.roll(block, TILE_C - 1, axis=1)
    b10 = pltpu.roll(block, TILE_R - 1, axis=0)
    b11 = pltpu.roll(b10, TILE_C - 1, axis=1)
    return (
        block * (1 - ay) * (1 - ax)
        + b01 * (1 - ay) * ax
        + b10 * ay * (1 - ax)
        + b11 * ay * ax
    )


def _split(v, lo, hi):
    i = jnp.floor(v).astype(jnp.int32)
    i = jnp.clip(i, lo, hi)
    return i, v - i.astype(jnp.float32)


def _kernel(pts_ref, img0_ref, img1_ref, out_pts_ref, out_ok_ref,
            win0, win1, sem):
    f = pl.program_id(0)
    n = pl.num_programs(0)
    h = img0_ref.shape[0]
    w = img0_ref.shape[1]

    def clamp_base(c, center, dim, span, align):
        # DMA slice starts must be provably tile-aligned
        b = (jnp.round(c).astype(jnp.int32) - center) // align * align
        return pl.multiple_of(jnp.clip(b, 0, dim - span), align)

    def dma_pair(fi, slot):
        """DMA descriptors for feature ``fi``'s search windows into buffer
        ``slot``. 128-aligned lane base offset by 64 keeps the feature
        >=64 lanes from the window edge; 8-aligned row base likewise."""
        bx0 = clamp_base(pts_ref[fi, 0], 64, w, RCOLS, 128)
        by0 = clamp_base(pts_ref[fi, 1], RROWS // 2, h, RROWS, 8)
        bx1 = clamp_base(pts_ref[fi, 2], 64, w, RCOLS, 128)
        by1 = clamp_base(pts_ref[fi, 3], RROWS // 2, h, RROWS, 8)
        d0 = pltpu.make_async_copy(
            img0_ref.at[pl.ds(by0, RROWS), pl.ds(bx0, RCOLS)],
            win0.at[slot], sem.at[slot, 0],
        )
        d1 = pltpu.make_async_copy(
            img1_ref.at[pl.ds(by1, RROWS), pl.ds(bx1, RCOLS)],
            win1.at[slot], sem.at[slot, 1],
        )
        return d0, d1

    # Double-buffered DMA across grid steps (scratch persists between
    # programs on TPU): feature f+1's windows stream in while feature f
    # computes, hiding the HBM latency that otherwise stalls every program.
    one = jnp.asarray(1, jnp.int32)  # keep int32 under x64 interpret mode
    slot = jax.lax.rem(f, 2 * one)
    nxt = jax.lax.rem(f + one, 2 * one)

    @pl.when(f == 0)
    def _():
        d0, d1 = dma_pair(f, slot)
        d0.start()
        d1.start()

    @pl.when(f + 1 < n)
    def _():
        d0, d1 = dma_pair(f + 1, nxt)
        d0.start()
        d1.start()

    d0, d1 = dma_pair(f, slot)
    d0.wait()
    d1.wait()

    x0 = pts_ref[f, 0]
    y0 = pts_ref[f, 1]
    x1 = pts_ref[f, 2]
    y1 = pts_ref[f, 3]
    bx0 = clamp_base(x0, 64, w, RCOLS, 128)
    by0 = clamp_base(y0, RROWS // 2, h, RROWS, 8)
    bx1 = clamp_base(x1, 64, w, RCOLS, 128)
    by1 = clamp_base(y1, RROWS // 2, h, RROWS, 8)

    # Branch on the buffer slot so every in-loop window read uses a STATIC
    # leading index (a dynamic scratch index inside the LK iteration loop
    # lowers to slow addressing in Mosaic; the compute body is emitted
    # twice instead).
    @pl.when(slot == 0)
    def _():
        _lk_compute(win0.at[0], win1.at[0], out_pts_ref, out_ok_ref, f,
                    x0, y0, x1, y1, bx0, by0, bx1, by1, h, w)

    @pl.when(slot == 1)
    def _():
        _lk_compute(win0.at[1], win1.at[1], out_pts_ref, out_ok_ref, f,
                    x0, y0, x1, y1, bx0, by0, bx1, by1, h, w)


def _lk_compute(w0, w1, out_pts_ref, out_ok_ref, f,
                x0, y0, x1, y1, bx0, by0, bx1, by1, h, w):
    m21 = _mask(WIN)

    # --- template patch + gradients (win0 local coords) ---
    lx0 = x0 - bx0.astype(jnp.float32)
    ly0 = y0 - by0.astype(jnp.float32)
    ix0, ax0 = _split(lx0 - HALF, 1, RCOLS - WIN - 2)
    iy0, ay0 = _split(ly0 - HALF, 1, RROWS - WIN - 2)
    # B[u, v] = bilinear(win0 at (iy0-1+u+ay0, ix0-1+v+ax0))
    big = _bilinear_tile(_aligned_block(w0, iy0 - 1, ix0 - 1), ay0, ax0)
    br1 = pltpu.roll(big, TILE_R - 1, axis=0)
    bc1 = pltpu.roll(big, TILE_C - 1, axis=1)
    t = pltpu.roll(br1, TILE_C - 1, axis=1)  # patch at (+1, +1)
    gx = 0.5 * (pltpu.roll(br1, TILE_C - 2, axis=1) - br1)
    gy = 0.5 * (pltpu.roll(bc1, TILE_R - 2, axis=0) - bc1)

    gxx = jnp.sum(gx * gx * m21)
    gxy = jnp.sum(gx * gy * m21)
    gyy = jnp.sum(gy * gy * m21)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (WIN * WIN)
    good = min_eig > MIN_EIG
    inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

    # --- iterate (win1 local coords) ---
    lx1 = x1 - bx1.astype(jnp.float32)
    ly1 = y1 - by1.astype(jnp.float32)

    in0 = (
        (x0 >= HALF + 1) & (x0 <= w - HALF - 2)
        & (y0 >= HALF + 1) & (y0 <= h - HALF - 2)
    )

    def in_bounds_local(px, py):
        return (
            (px >= HALF) & (px <= RCOLS - HALF - 2)
            & (py >= HALF) & (py <= RROWS - HALF - 2)
        )

    def body(_, carry):
        px, py, done = carry
        ix, ax = _split(px - HALF, 0, RCOLS - WIN - 1)
        iy, ay = _split(py - HALF, 0, RROWS - WIN - 1)
        patch = _bilinear_tile(_aligned_block(w1, iy, ix), ay, ax)
        diff = (patch - t) * m21
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
    # genuine early exit (the reference's OpenCV criteria stop at ~5
    # iterations on converged features; a fixed 30-trip loop wastes 6x)
    def cond(carry):
        i, px, py, done = carry
        return (~done) & (i < MAX_ITERS)

    def wbody(carry):
        i, px, py, done = carry
        px, py, done = body(i, (px, py, done))
        return i + 1, px, py, done

    _, px, py, _ = jax.lax.while_loop(cond, wbody, (0, lx1, ly1, ~ok0))

    gx1 = px + bx1.astype(jnp.float32)
    gy1 = py + by1.astype(jnp.float32)
    ok = (
        ok0
        & (gx1 >= HALF) & (gx1 <= w - 1 - HALF)
        & (gy1 >= HALF) & (gy1 <= h - 1 - HALF)
    )

    out_pts_ref[f, 0] = gx1
    out_pts_ref[f, 1] = gy1
    out_ok_ref[f, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _track_level_pallas(img0, img1, pts4, interpret=False):
    n = pts4.shape[0]
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
            pltpu.VMEM((2, RROWS, RCOLS), jnp.float32),
            pltpu.VMEM((2, RROWS, RCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out_pts, out_ok = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pts4, img0, img1)
    return out_pts, out_ok[:, 0] > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def lk_track_pallas(pyr0, pyr1, pts0, pts1_init, valid, interpret=False):
    """Pyramidal LK over all levels; same contract as ``klt.lk_track``.
    One jitted program: all levels fuse into a single dispatch.

    Every level is padded (edge replication) to the LEVEL-0 shape before
    the kernel call: the kernel's per-feature DMA window is a fixed
    (RROWS, RCOLS) footprint independent of image size, so same-shape
    inputs make all ``levels x directions`` pallas_calls byte-identical —
    ONE Mosaic kernel compile instead of one per level per direction
    (the round-2 bench measured 615 s of compile for the tracking stage;
    the pad itself is a ~300 KB copy per level, noise)."""
    levels = len(pyr0)
    h0, w0 = pyr0[0].shape
    ph0, pw0 = max(RROWS - h0, 0), max(RCOLS - w0, 0)
    pts0 = pts0.astype(jnp.float32)
    pts1 = pts1_init.astype(jnp.float32) / (2.0 ** (levels - 1))
    ok = valid
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        if lv < levels - 1:
            pts1 = pts1 * 2.0
        pts4 = jnp.concatenate([pts0 / s, pts1], axis=1)
        h, w = pyr0[lv].shape
        if (h, w) != (h0 + ph0, w0 + pw0):
            i0 = jnp.pad(pyr0[lv], ((0, h0 + ph0 - h), (0, w0 + pw0 - w)),
                         mode="edge")
            i1 = jnp.pad(pyr1[lv], ((0, h0 + ph0 - h), (0, w0 + pw0 - w)),
                         mode="edge")
        else:
            i0, i1 = pyr0[lv], pyr1[lv]
        pts1_new, ok_lv = _track_level_pallas(i0, i1, pts4, interpret=interpret)
        pts1 = pts1_new
        if lv == 0:
            ok = ok & ok_lv
    return pts1, ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def lk_track_bidirectional_pallas(pyr0, pyr1, pts0, pts1_init, valid,
                                  fb_thresh=0.5, interpret=False):
    pts1, ok_f = lk_track_pallas(pyr0, pyr1, pts0, pts1_init, valid, interpret)
    pts0_back, ok_b = lk_track_pallas(pyr1, pyr0, pts1, pts0, ok_f, interpret)
    fb = jnp.linalg.norm(pts0_back - pts0.astype(jnp.float32), axis=-1)
    return pts1, ok_f & ok_b & (fb < fb_thresh), fb
