"""Image preprocessing: CLAHE and illumination-glitch detection.

Parity with the reference tracking preprocessing (``tracking.cc:107-142``):

* CLAHE (contrast-limited adaptive histogram equalization, the reference
  uses ``cv::createCLAHE(clip=3.0, tiles=8x8)``) re-expressed as one XLA
  program: per-tile 256-bin histograms via one-hot matmuls (MXU), clip +
  redistribute, per-tile CDF lookup, and bilinear interpolation between
  tile mappings (the standard CLAHE interpolation).
* histogram-change frame gate (``tracking.cc:88-105``): correlation of
  consecutive frame histograms; a sudden illumination glitch yields a low
  correlation and the frame is skipped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BINS = 256


def _tile_histograms(img, th, tw):
    """[ty, tx, 256] histograms via one-hot reduction (MXU-friendly)."""
    h, w = img.shape
    ty, tx = h // th, w // tw
    tiles = img[: ty * th, : tx * tw].reshape(ty, th, tx, tw)
    vals = jnp.clip(tiles, 0, 255).astype(jnp.int32)
    onehot = jax.nn.one_hot(vals, BINS, dtype=jnp.float32)  # [ty,th,tx,tw,256]
    return jnp.sum(onehot, axis=(1, 3))  # [ty,tx,256]


@partial(jax.jit, static_argnames=("tiles", "clip_limit"))
def clahe(img: jax.Array, tiles: int = 8, clip_limit: float = 3.0) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (uint8-range input)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    th, tw = h // tiles, w // tiles
    hist = _tile_histograms(img, th, tw)  # [ty,tx,256]
    npix = th * tw

    # clip + redistribute excess uniformly (OpenCV CLAHE semantics)
    limit = clip_limit * npix / BINS
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / BINS

    cdf = jnp.cumsum(hist, axis=-1)
    # normalize each tile's CDF to [0, 255]
    cdf = (cdf - cdf[..., :1]) / jnp.maximum(cdf[..., -1:] - cdf[..., :1], 1.0)
    lut = cdf * 255.0  # [ty,tx,256]

    # bilinear interpolation between the four surrounding tile LUTs
    ty, tx = hist.shape[0], hist.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    fy = jnp.clip((ys - th / 2) / th, 0.0, ty - 1.0)
    fx = jnp.clip((xs - tw / 2) / tw, 0.0, tx - 1.0)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ty - 2) if ty > 1 else jnp.zeros_like(fy, jnp.int32)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, tx - 2) if tx > 1 else jnp.zeros_like(fx, jnp.int32)
    ay = (fy - y0) if ty > 1 else jnp.zeros_like(fy)
    ax = (fx - x0) if tx > 1 else jnp.zeros_like(fx)

    v = jnp.clip(img, 0, 255).astype(jnp.int32)
    yy0 = y0[:, None]
    xx0 = x0[None, :]
    l00 = lut[yy0, xx0, v]
    l01 = lut[yy0, jnp.minimum(xx0 + 1, tx - 1), v]
    l10 = lut[jnp.minimum(yy0 + 1, ty - 1), xx0, v]
    l11 = lut[jnp.minimum(yy0 + 1, ty - 1), jnp.minimum(xx0 + 1, tx - 1), v]
    ayc = ay[:, None]
    axc = ax[None, :]
    out = (
        l00 * (1 - ayc) * (1 - axc)
        + l01 * (1 - ayc) * axc
        + l10 * ayc * (1 - axc)
        + l11 * ayc * axc
    )
    return out


@jax.jit
def histogram_correlation(img0: jax.Array, img1: jax.Array) -> jax.Array:
    """Correlation of the two frames' 256-bin histograms
    (cv::compareHist HISTCMP_CORREL semantics, tracking.cc:88-105)."""

    def hist(img):
        v = jnp.clip(img, 0, 255).astype(jnp.int32).reshape(-1)
        return jnp.sum(jax.nn.one_hot(v, BINS, dtype=jnp.float32), axis=0)

    h0, h1 = hist(img0), hist(img1)
    d0, d1 = h0 - h0.mean(), h1 - h1.mean()
    return jnp.sum(d0 * d1) / jnp.maximum(
        jnp.sqrt(jnp.sum(d0**2) * jnp.sum(d1**2)), 1e-9
    )
