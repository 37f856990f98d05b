"""Batched pyramidal Lucas-Kanade optical flow.

Capability parity with the reference's OpenCV LK usage
(``tracking.cc:351-574``): 21x21 window, 3 pyramid levels, up to 30
iterations, support for an initial-flow prediction
(OPTFLOW_USE_INITIAL_FLOW — here simply the initial guess array), and the
forward-backward consistency check (< 0.5 px, ``tracking.cc:396-403``).

Design: all features are tracked simultaneously — one program, vmapped over
the feature axis; each level is a fixed-iteration ``fori_loop`` whose update
freezes once converged (XLA-friendly masked iteration instead of per-feature
early exit). Template gradients are precomputed per level (forward-additive
LK, matching OpenCV's scheme with Scharr derivatives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WIN = 21  # window size (21x21, tracking.h: LK window)
HALF = WIN // 2
MAX_ITERS = 30
EPS_STEP = 0.01  # convergence threshold on the update norm (px)
MIN_EIG = 1e-4  # minimum normalized eigenvalue of the gradient matrix


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array):
    """Bilinear sample img at float coords (y, x) arrays."""
    h, w = img.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    ax = x - x0
    ay = y - y0
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    i00 = img[y0c, x0c]
    i01 = img[y0c, x0c + 1]
    i10 = img[y0c + 1, x0c]
    i11 = img[y0c + 1, x0c + 1]
    return (
        i00 * (1 - ay) * (1 - ax)
        + i01 * (1 - ay) * ax
        + i10 * ay * (1 - ax)
        + i11 * ay * ax
    )


def _patch_grid(dtype=jnp.float32):
    r = jnp.arange(WIN, dtype=dtype) - HALF
    return jnp.meshgrid(r, r, indexing="ij")  # (dy, dx)


def _sample_patch(img, pt):
    """21x21 bilinear patch centered at pt = (x, y)."""
    dy, dx = _patch_grid()
    return _bilinear(img, pt[1] + dy, pt[0] + dx)


def _in_bounds(img, pt):
    h, w = img.shape
    return (
        (pt[0] >= HALF)
        & (pt[0] <= w - 1 - HALF)
        & (pt[1] >= HALF)
        & (pt[1] <= h - 1 - HALF)
    )


def _track_level(img0, img1, pt0, pt1_init, ok_in):
    """LK at one pyramid level for a single feature."""
    # Template patch + gradients (central differences on the sampled grid).
    dy, dx = _patch_grid()
    t = _bilinear(img0, pt0[1] + dy, pt0[0] + dx)
    gx = 0.5 * (
        _bilinear(img0, pt0[1] + dy, pt0[0] + dx + 1.0)
        - _bilinear(img0, pt0[1] + dy, pt0[0] + dx - 1.0)
    )
    gy = 0.5 * (
        _bilinear(img0, pt0[1] + dy + 1.0, pt0[0] + dx)
        - _bilinear(img0, pt0[1] + dy - 1.0, pt0[0] + dx)
    )

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (WIN * WIN)
    good_grad = min_eig > MIN_EIG
    inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

    def body(_, carry):
        pt, done = carry
        patch = _bilinear(img1, pt[1] + dy, pt[0] + dx)
        diff = patch - t
        b1 = jnp.sum(diff * gx)
        b2 = jnp.sum(diff * gy)
        dpt = -inv * jnp.stack([gyy * b1 - gxy * b2, gxx * b2 - gxy * b1])
        step_ok = _in_bounds(img1, pt + dpt)
        pt_new = jnp.where(done | ~step_ok, pt, pt + dpt)
        done_new = done | (jnp.linalg.norm(dpt) < EPS_STEP) | ~step_ok
        return pt_new, done_new

    ok0 = ok_in & _in_bounds(img0, pt0) & _in_bounds(img1, pt1_init) & good_grad
    pt1, _ = jax.lax.fori_loop(0, MAX_ITERS, body, (pt1_init, ~ok0))
    ok = ok0 & _in_bounds(img1, pt1)
    return pt1, ok


def lk_track(pyr0, pyr1, pts0, pts1_init, valid):
    """Track pts0 (N,2 in x,y pixels of level 0) from pyramid pyr0 to pyr1.

    pts1_init provides the initial flow (e.g. INS-predicted positions,
    parity with OPTFLOW_USE_INITIAL_FLOW at ``tracking.cc:385-393``).
    Returns (pts1 [N,2], ok [N]).
    """
    levels = len(pyr0)

    def one(pt0, pt1i, ok_in):
        # all LK math runs in f32 (image dtype), regardless of caller dtype
        pt0 = pt0.astype(jnp.float32)
        scale = 2.0 ** (levels - 1)
        pt1 = pt1i.astype(jnp.float32) / scale
        ok = ok_in
        for lv in range(levels - 1, -1, -1):
            s = 2.0**lv
            pt1 = pt1 * (2.0 if lv < levels - 1 else 1.0)
            pt1, ok_lv = _track_level(pyr0[lv], pyr1[lv], pt0 / s, pt1, ok_in)
            ok = ok & ok_lv if lv == 0 else ok
        return pt1, ok

    return jax.vmap(one)(pts0, pts1_init, valid)


def lk_track_bidirectional(pyr0, pyr1, pts0, pts1_init, valid, fb_thresh=0.5):
    """Forward + backward LK with consistency gate
    (``tracking.cc:396-403``: < 0.5 px)."""
    pts1, ok_f = lk_track(pyr0, pyr1, pts0, pts1_init, valid)
    pts0_back, ok_b = lk_track(pyr1, pyr0, pts1, pts0, ok_f)
    fb_err = jnp.linalg.norm(pts0_back - pts0, axis=-1)
    ok = ok_f & ok_b & (fb_err < fb_thresh)
    return pts1, ok, fb_err


# ---------------------------------------------------------------------------
# MXU formulation: bilinear sampling as two-hot row/col matmuls
# ---------------------------------------------------------------------------


def _twohot(origin, n: int, taps: int, dtype=jnp.float32):
    """[F, taps, n] bilinear sampling matrix: row u holds (1-a) at
    floor(origin)+u and a at floor(origin)+u+1 — so ``W @ signal`` is the
    bilinearly interpolated window. The gather-free TPU formulation:
    sampling becomes MXU matmuls (the same scatter/gather->one-hot-einsum
    technique that fixed the solver assembly)."""
    o0f = jnp.floor(origin)
    a = (origin - o0f).astype(dtype)[:, None, None]
    # Max valid origin is n - taps - 1: row u = taps-1 samples indices
    # o0 + taps - 1 (w0) and o0 + taps (w1), so o0 + taps <= n - 1 exactly
    # when o0 <= n - taps - 1.  Origins beyond that (feature outside the
    # _in_bounds_b margin) clamp, shifting the window — such features are
    # already masked invalid by the caller's bounds check.
    o0 = jnp.clip(o0f.astype(jnp.int32), 0, n - taps - 1)
    idx = jnp.arange(n)[None, None, :]
    base = (o0[:, None] + jnp.arange(taps)[None, :])[:, :, None]
    w0 = (idx == base).astype(dtype)
    w1 = (idx == base + 1).astype(dtype)
    return w0 * (1 - a) + w1 * a


def _sample_windows(img, ox, oy, taps: int):
    """[F, taps, taps] bilinear windows at per-feature origins (x, y)."""
    h, w = img.shape
    wr = _twohot(oy, h, taps)
    wc = _twohot(ox, w, taps)
    tmp = jnp.einsum("fuh,hw->fuw", wr, img)
    return jnp.einsum("fuw,fvw->fuv", tmp, wc)


def _in_bounds_b(shape, pts):
    h, w = shape
    return (
        (pts[:, 0] >= HALF) & (pts[:, 0] <= w - 1 - HALF)
        & (pts[:, 1] >= HALF) & (pts[:, 1] <= h - 1 - HALF)
    )


def _track_level_matmul(img0, img1, pts0, pts1_init, ok_in):
    """One LK level for ALL features at once: every bilinear window sample
    is two batched einsums (MXU) instead of per-element gathers; the
    iteration loop is batched with a per-feature convergence freeze and a
    whole-batch early exit."""
    s = _sample_windows(img0, pts0[:, 0] - HALF - 1, pts0[:, 1] - HALF - 1,
                        WIN + 2)
    t = s[:, 1:-1, 1:-1]
    gx = 0.5 * (s[:, 1:-1, 2:] - s[:, 1:-1, :-2])
    gy = 0.5 * (s[:, 2:, 1:-1] - s[:, :-2, 1:-1])

    gxx = jnp.sum(gx * gx, axis=(1, 2))
    gxy = jnp.sum(gx * gy, axis=(1, 2))
    gyy = jnp.sum(gy * gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (WIN * WIN)
    good = min_eig > MIN_EIG
    inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

    ok0 = (
        ok_in & _in_bounds_b(img0.shape, pts0)
        & _in_bounds_b(img1.shape, pts1_init) & good
    )

    def cond(carry):
        i, pt, done = carry
        return (i < MAX_ITERS) & jnp.any(~done)

    def body(carry):
        i, pt, done = carry
        patch = _sample_windows(img1, pt[:, 0] - HALF, pt[:, 1] - HALF, WIN)
        diff = patch - t
        b1 = jnp.sum(diff * gx, axis=(1, 2))
        b2 = jnp.sum(diff * gy, axis=(1, 2))
        dx = -inv * (gyy * b1 - gxy * b2)
        dy = -inv * (gxx * b2 - gxy * b1)
        dpt = jnp.stack([dx, dy], -1)
        step_ok = _in_bounds_b(img1.shape, pt + dpt)
        frozen = done | ~step_ok
        pt_new = jnp.where(frozen[:, None], pt, pt + dpt)
        done_new = done | (dx * dx + dy * dy < EPS_STEP * EPS_STEP) | ~step_ok
        return i + 1, pt_new, done_new

    _, pt1, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), pts1_init, ~ok0)
    )
    ok = ok0 & _in_bounds_b(img1.shape, pt1)
    return pt1, ok


def lk_track_matmul(pyr0, pyr1, pts0, pts1_init, valid):
    """Pyramidal LK, MXU formulation; same contract as ``lk_track``."""
    levels = len(pyr0)
    pts0 = pts0.astype(jnp.float32)
    pts1 = pts1_init.astype(jnp.float32) / (2.0 ** (levels - 1))
    ok = valid
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        if lv < levels - 1:
            pts1 = pts1 * 2.0
        pts1, ok_lv = _track_level_matmul(
            pyr0[lv], pyr1[lv], pts0 / s, pts1, valid
        )
        if lv == 0:
            ok = ok & ok_lv
    return pts1, ok


def lk_track_bidirectional_matmul(pyr0, pyr1, pts0, pts1_init, valid,
                                  fb_thresh=0.5):
    """Forward + backward MXU LK with the 0.5 px consistency gate."""
    pts1, ok_f = lk_track_matmul(pyr0, pyr1, pts0, pts1_init, valid)
    pts0_back, ok_b = lk_track_matmul(pyr1, pyr0, pts1, pts0.astype(jnp.float32), ok_f)
    fb_err = jnp.linalg.norm(pts0_back - pts0.astype(jnp.float32), axis=-1)
    ok = ok_f & ok_b & (fb_err < fb_thresh)
    return pts1, ok, fb_err
