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


def occupancy_mask(shape, pts, valid, radius=MASK_RADIUS):
    """False within `radius` px of any valid existing feature
    (the detection mask of ``tracking.cc:600-626``)."""
    h, w = shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def near(carry, i):
        m = carry
        d2 = (ys - pts[i, 1]) ** 2 + (xs - pts[i, 0]) ** 2
        hit = (d2 < radius * radius) & valid[i]
        return m | hit, None

    occ, _ = jax.lax.scan(near, jnp.zeros((h, w), bool), jnp.arange(pts.shape[0]))
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
