"""Shi-Tomasi corner detection with grid-cell selection and occupancy mask.

Capability parity with the reference's block-parallel detection
(``tracking.cc:576-688``: goodFeaturesToTrack per 200-px block under a mask
of existing features, TBB-parallel): here the whole image is processed as
one XLA program — Sobel structure tensor, min-eigenvalue response, then one
maximum per grid cell (the data-parallel analog of per-block detection),
suppressed near existing features by an occupancy mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MASK_RADIUS = 25.0  # min distance to existing features (tracking.cc mask)


def _sobel(img):
    """Sobel gradients with replicate borders."""
    p = jnp.pad(img, 1, mode="edge")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) * 0.125
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) * 0.125
    return gx, gy


def _box3(img):
    p = jnp.pad(img, 1, mode="edge")
    return (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0


def shi_tomasi_response(img: jax.Array) -> jax.Array:
    """Min-eigenvalue of the 3x3-windowed structure tensor."""
    gx, gy = _sobel(img.astype(jnp.float32))
    jxx = _box3(gx * gx)
    jxy = _box3(gx * gy)
    jyy = _box3(gy * gy)
    tr = jxx + jyy
    det = jxx * jyy - jxy * jxy
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))


def occupancy_mask(shape, pts, valid, radius=MASK_RADIUS, chunk=32):
    """False within `radius` px of any valid existing feature
    (the detection mask of ``tracking.cc:600-626``).

    Features are processed ``chunk`` at a time: one [chunk, h, w] distance
    field reduced over the chunk axis per scan step (a per-feature scan
    serializes F full-image passes — measured as the dominant cost of the
    detect stage; chunking recovers the VPU parallelism at bounded
    memory, chunk*h*w*4 ~ 10 MB)."""
    h, w = shape
    F = pts.shape[0]
    pad = (-F) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    px = pts_p[:, 0].reshape(-1, chunk)
    py = pts_p[:, 1].reshape(-1, chunk)
    vd = valid_p.reshape(-1, chunk)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    def near(m, args):
        cx, cy, cv = args
        d2 = (ys - cy[:, None, None]) ** 2 + (xs - cx[:, None, None]) ** 2
        hit = jnp.any((d2 < radius * radius) & cv[:, None, None], axis=0)
        return m | hit, None

    occ, _ = jax.lax.scan(near, jnp.zeros((h, w), bool), (px, py, vd))
    return ~occ


@partial(jax.jit, static_argnames=("cell", "max_new", "border"))
def detect_features(
    img: jax.Array,
    existing_pts: jax.Array,
    existing_valid: jax.Array,
    cell: int = 64,
    max_new: int = 128,
    border: int = 16,
    quality_rel: float = 0.01,
):
    """Grid-cell Shi-Tomasi detection.

    Returns (pts [max_new, 2], score [max_new], ok [max_new]): the best
    corner of each grid cell that passes the occupancy + quality gates,
    strongest cells first.
    """
    h, w = img.shape
    resp = shi_tomasi_response(img)
    free = occupancy_mask((h, w), existing_pts, existing_valid)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    resp = jnp.where(free & inb, resp, -1.0)

    gh, gw = h // cell, w // cell
    blocks = resp[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    blocks = blocks.transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    best = jnp.argmax(blocks, axis=1)
    score = jnp.take_along_axis(blocks, best[:, None], axis=1)[:, 0]

    cy = best // cell + (jnp.arange(gh * gw) // gw) * cell
    cx = best % cell + (jnp.arange(gh * gw) % gw) * cell
    pts = jnp.stack([cx, cy], axis=-1).astype(jnp.float32)

    # quality gate relative to the global best (goodFeaturesToTrack style)
    thr = quality_rel * jnp.max(score)
    ok = score > jnp.maximum(thr, 0.0)

    order = jnp.argsort(-score)
    take = order[:max_new]
    return pts[take], score[take], ok[take]


_SUBPIX_PATCH = 32  # per-point working patch (covers window + drift + taps)


@partial(jax.jit, static_argnames=("win", "max_iters"))
def corner_subpix(
    img: jax.Array,
    pts: jax.Array,
    valid: jax.Array,
    win: int = 5,
    max_iters: int = 20,
    eps: float = 0.01,
):
    """Subpixel corner refinement, batched over points.

    Capability parity with the ``cv::cornerSubPix`` call after block
    detection (``tracking.cc:622-652``: win 5x5, no zero zone, 20 iters,
    eps 0.01): iterate q = p + A^-1 b over the Gaussian-weighted structure
    tensor of a (2*win+1)^2 window until the update is below eps. Points
    whose refinement diverges beyond the window revert to their input.
    Returns refined pts [N, 2].

    TPU structure: each point extracts ONE 32x32 patch up front
    (vmapped dynamic_slice); every iteration then samples its window from
    the patch with the rigid-window bilinear trick — the whole 13x13 tap
    grid shares one fractional offset, so the sample is an integer-origin
    dynamic_slice blended across its four +-1 shifts. No per-element image
    gathers anywhere (the previous per-iteration bilinear gathers made
    this stage slower than the LK kernel itself, BENCH_r02).
    """
    imgf = img.astype(jnp.float32)
    h, w = imgf.shape
    P = _SUBPIX_PATCH
    size = 2 * win + 1  # 11
    taps = size + 2  # 13: window plus the +-1 gradient taps
    # Gaussian window weights, exp(-(i/win)^2 - (j/win)^2)
    r = (jnp.arange(size, dtype=jnp.float32) - win) / win
    wts = jnp.exp(-r * r)[:, None] * jnp.exp(-r * r)[None, :]
    px = (jnp.arange(size, dtype=jnp.float32) - win)[None, :]
    py = (jnp.arange(size, dtype=jnp.float32) - win)[:, None]

    pts32 = pts.astype(jnp.float32)
    base = jnp.clip(
        jnp.round(pts32).astype(jnp.int32) - P // 2,
        0, jnp.array([w - P, h - P], jnp.int32),
    )  # [N,2] (x, y) patch origins

    def extract(b):
        return jax.lax.dynamic_slice(imgf, (b[1], b[0]), (P, P))

    patches = jax.vmap(extract)(base)  # [N,P,P]

    def refine(pt0_abs, b, patch):
        pt0 = pt0_abs - b.astype(jnp.float32)  # patch-local

        def step(carry):
            i, pt, _, shifted = carry
            # window origin (tap [-win-1, -win-1]) in patch coords
            org = pt - (win + 1)
            oi_true = jnp.floor(org).astype(jnp.int32)
            oi = jnp.clip(oi_true, 0, P - taps - 1)
            # A clamped origin means the sampled window silently shifted
            # away from pt (border feature whose patch origin was itself
            # clipped); gradients then come from the wrong location, so
            # such points are reverted to pt0 below — mirroring OpenCV's
            # contract that cornerSubPix needs the window fully inside.
            shifted = shifted | jnp.any(oi != oi_true)
            a = org - oi.astype(jnp.float32)
            blk = jax.lax.dynamic_slice(patch, (oi[1], oi[0]),
                                        (taps + 1, taps + 1))
            s = (
                blk[:taps, :taps] * (1 - a[1]) * (1 - a[0])
                + blk[:taps, 1:] * (1 - a[1]) * a[0]
                + blk[1:, :taps] * a[1] * (1 - a[0])
                + blk[1:, 1:] * a[1] * a[0]
            )  # [taps, taps] bilinear window at pt
            gx = s[1:-1, 2:] - s[1:-1, :-2]
            gy = s[2:, 1:-1] - s[:-2, 1:-1]
            gxx = gx * gx * wts
            gxy = gx * gy * wts
            gyy = gy * gy * wts
            aa = jnp.sum(gxx)
            bb = jnp.sum(gxy)
            cc = jnp.sum(gyy)
            bb1 = jnp.sum(gxx * px + gxy * py)
            bb2 = jnp.sum(gxy * px + gyy * py)
            det = aa * cc - bb * bb
            ok = jnp.abs(det) > 1e-12
            scale = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            d = jnp.array([cc * bb1 - bb * bb2, aa * bb2 - bb * bb1]) * scale
            err = jnp.sum(d * d)
            return i + 1, pt + d, jnp.where(ok, err, 0.0), shifted

        def cond(carry):
            i, pt, err, _ = carry
            inb = (pt[0] >= 0) & (pt[0] < P) & (pt[1] >= 0) & (pt[1] < P)
            return (i < max_iters) & (err > eps * eps) & inb

        _, pt, _, shifted = jax.lax.while_loop(
            cond, step, (0, pt0, jnp.inf, jnp.asarray(False))
        )
        # revert points that drifted out of the search window or whose
        # sampling window ever clamped against the patch border
        drift = jnp.abs(pt - pt0)
        bad = (drift[0] > win + 1) | (drift[1] > win + 1) | shifted
        return jnp.where(bad, pt0, pt) + b.astype(jnp.float32)

    out = jax.vmap(refine)(pts32, base, patches)
    return jnp.where(valid[:, None], out, pts32)


def _det_bilinear(img, y, x):
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    ax = jnp.clip(x - x0, 0.0, 1.0)
    ay = jnp.clip(y - y0, 0.0, 1.0)
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - ay) * (1 - ax)
        + i01 * (1 - ay) * ax
        + i10 * ay * (1 - ax)
        + i11 * ay * ax
    )
