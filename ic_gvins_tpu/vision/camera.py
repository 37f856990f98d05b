"""Pinhole camera model with radial-tangential distortion, batched.

Parity with the reference camera (``tracking/camera.{h,cc}``): intrinsics
[fx, fy, cx, cy] (+ optional skew), distortion [k1, k2, p1, p2, (k3)],
analytic distort (``camera.cc:76-117``), iterative undistort (replacing
OpenCV's ``undistortPoints``, fixed-iteration for XLA), pixel<->camera<->
world transforms (``camera.cc:123-151``), and reprojection error
(``camera.cc:153-157``). All functions broadcast over leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import rotation as rot


class Camera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    skew: jax.Array
    k1: jax.Array
    k2: jax.Array
    k3: jax.Array
    p1: jax.Array
    p2: jax.Array
    width: int
    height: int

    @staticmethod
    def create(intrinsic, distortion, resolution, dtype=jnp.float64) -> "Camera":
        """intrinsic = [fx, fy, cx, cy(, skew)], distortion =
        [k1, k2, p1, p2(, k3)] — the reference's YAML layout
        (``gvins.yaml:62-73``, parsed like ``camera.cc:48-70``)."""
        intr = list(intrinsic)
        dist = list(distortion)
        skew = intr[4] if len(intr) > 4 else 0.0
        k3 = dist[4] if len(dist) > 4 else 0.0
        a = lambda x: jnp.asarray(x, dtype)
        return Camera(
            fx=a(intr[0]), fy=a(intr[1]), cx=a(intr[2]), cy=a(intr[3]), skew=a(skew),
            k1=a(dist[0]), k2=a(dist[1]), p1=a(dist[2]), p2=a(dist[3]), k3=a(k3),
            width=int(resolution[0]), height=int(resolution[1]),
        )

    @property
    def focal(self):
        """(fx + fy) / 2, used for reprojection-std normalization
        (``camera.h:82-84``, ``ic_gvins.cc:157``)."""
        return 0.5 * (self.fx + self.fy)


def distort(cam: Camera, xy: jax.Array) -> jax.Array:
    """Apply distortion in the normalized plane (…,2) -> (…,2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort(cam: Camera, xy_d: jax.Array, iters: int = 8) -> jax.Array:
    """Invert the distortion by fixed-point iteration (static trip count)."""

    def body(_, xy):
        d = distort(cam, xy) - xy
        return xy_d - d

    return jax.lax.fori_loop(0, iters, body, xy_d)


def cam_to_pixel(cam: Camera, xyz: jax.Array) -> jax.Array:
    """Camera-frame point -> distorted pixel."""
    xy = xyz[..., :2] / xyz[..., 2:3]
    xy_d = distort(cam, xy)
    u = cam.fx * xy_d[..., 0] + cam.skew * xy_d[..., 1] + cam.cx
    v = cam.fy * xy_d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pixel_to_cam(cam: Camera, uv: jax.Array) -> jax.Array:
    """Distorted pixel -> undistorted normalized-plane homogeneous point."""
    y = (uv[..., 1] - cam.cy) / cam.fy
    x = (uv[..., 0] - cam.cx - cam.skew * y) / cam.fx
    xy = undistort(cam, jnp.stack([x, y], axis=-1))
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def pixel_to_unit_cam(cam: Camera, uv: jax.Array) -> jax.Array:
    """Distorted pixel -> unit bearing vector in the camera frame."""
    pc = pixel_to_cam(cam, uv)
    return pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)


def world_to_pixel(cam: Camera, pw: jax.Array, r_wc: jax.Array, t_wc: jax.Array):
    """World point -> pixel through camera pose (R_wc, t_wc = camera->world)."""
    pc = jnp.einsum("...ji,...j->...i", r_wc, pw - t_wc)
    return cam_to_pixel(cam, pc)


def pixel_to_world(cam: Camera, uv: jax.Array, depth, r_wc: jax.Array, t_wc: jax.Array):
    pc = pixel_to_cam(cam, uv) * depth[..., None]
    return jnp.einsum("...ij,...j->...i", r_wc, pc) + t_wc


def reprojection_error_px(cam: Camera, pw, r_wc, t_wc, uv):
    """Pixel-space reprojection error norm (``camera.cc:153-157``)."""
    return jnp.linalg.norm(world_to_pixel(cam, pw, r_wc, t_wc) - uv, axis=-1)
