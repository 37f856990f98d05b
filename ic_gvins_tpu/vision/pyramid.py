"""Image pyramid construction (OpenCV-compatible pyrDown semantics).

Feeds the batched LK tracker (parity with the reference's
``cv::calcOpticalFlowPyrLK`` usage at ``tracking.cc:385-393``:
TRACK_PYRAMID_LEVEL = 3, i.e. levels 0..3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# OpenCV pyrDown 5-tap kernel [1 4 6 4 1]/16 (plain floats: keeps the
# image dtype — a jnp constant would promote f32 images to f64 under x64).
_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _blur5(img: jax.Array) -> jax.Array:
    """Separable 5x5 binomial blur with edge replication."""
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(_K5[i] * pad[i : i + img.shape[0], :] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(_K5[i] * pad[:, i : i + img.shape[1]] for i in range(5))
    return img


def pyr_down(img: jax.Array) -> jax.Array:
    return _blur5(img)[::2, ::2]


def build_pyramid(img: jax.Array, levels: int = 3) -> tuple[jax.Array, ...]:
    """Returns (levels+1) images, level 0 = full resolution (float32)."""
    img = img.astype(jnp.float32)
    out = [img]
    for _ in range(levels):
        img = pyr_down(img)
        out.append(img)
    return tuple(out)
