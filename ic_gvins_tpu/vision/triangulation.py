"""Batched two-view landmark triangulation.

Parity with the reference triangulation (``tracking/tracking.cc:690-811``):
DLT from two camera poses + normalized observations, with the same validity
gates — parallax, positive depth in [NEAREST, FARTHEST] = [1, 200] m
(``mappoint.h:51-53``), and reprojection-error check. The reference's 4x4
SVD null vector (``tracking.cc:800-811``) becomes an eigh of A^T A (4x4
symmetric), which batches cleanly on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEAREST_DEPTH = 1.0
FARTHEST_DEPTH = 200.0
DEFAULT_DEPTH = 10.0


def triangulate(
    r_wc0, t_wc0,  # (…,3,3), (…,3) camera->world pose of the reference view
    r_wc1, t_wc1,  # observing view
    xy0, xy1,  # (…,2) undistorted normalized-plane observations
):
    """DLT triangulation. Returns world points (…,3)."""
    # Projection matrices world->image-plane: P = [R^T | -R^T t]
    rt0 = jnp.swapaxes(r_wc0, -1, -2)
    rt1 = jnp.swapaxes(r_wc1, -1, -2)
    p0 = jnp.concatenate([rt0, -jnp.einsum("...ij,...j->...i", rt0, t_wc0)[..., None]], axis=-1)
    p1 = jnp.concatenate([rt1, -jnp.einsum("...ij,...j->...i", rt1, t_wc1)[..., None]], axis=-1)

    rows = jnp.stack(
        [
            xy0[..., 0, None] * p0[..., 2, :] - p0[..., 0, :],
            xy0[..., 1, None] * p0[..., 2, :] - p0[..., 1, :],
            xy1[..., 0, None] * p1[..., 2, :] - p1[..., 0, :],
            xy1[..., 1, None] * p1[..., 2, :] - p1[..., 1, :],
        ],
        axis=-2,
    )  # (…,4,4)
    # TPU deviation from the reference's 4x4 SVD null vector
    # (tracking.cc:800-811): fix the homogeneous scale (h3 = 1, valid for
    # any FINITE point — the depth gates reject the near-infinity case)
    # and solve the 4x3 least squares via its 3x3 normal equations with a
    # closed-form adjugate inverse: pure elementwise VPU arithmetic. A
    # batched eigh here cost as much as the whole LM solve (BENCH r3).
    B = rows[..., :3]
    a4 = rows[..., 3]
    M = jnp.einsum("...ki,...kj->...ij", B, B)
    rhs = -jnp.einsum("...ki,...k->...i", B, a4)
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m11, m12, m22 = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c11 = m00 * m22 - m02 * m02
    c12 = m01 * m02 - m00 * m12
    c22 = m00 * m11 - m01 * m01
    det = m00 * c00 + m01 * c01 + m02 * c02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c01, c11, c12], -1),
        jnp.stack([c02, c12, c22], -1),
    ], -2)
    return jnp.einsum("...ij,...j->...i", adj, rhs) / det[..., None]


def depth_in_frame(pw, r_wc, t_wc):
    """z-depth of world points in a camera frame."""
    pc = jnp.einsum("...ji,...j->...i", r_wc, pw - t_wc)
    return pc[..., 2]


def triangulate_checked(
    r_wc0, t_wc0, r_wc1, t_wc1, xy0, xy1,
    reproj_thresh: float = 0.01,
    depth_scale: float = 3.0,
    min_parallax: float = 0.0,
):
    """Triangulate + the reference's validity gates
    (``isGoodToTrack(pp, pose, pw, 1.0, 3.0)``, tracking.cc:756 + 813-829):
    depth in (NEAREST, FARTHEST*depth_scale), reprojection error below
    ``reproj_thresh`` (normalized plane — pass px_std/focal for the
    reference's pixel gate), and rotation-compensated parallax at least
    ``min_parallax`` (normalized — pass 10/focal for the reference's
    TRACK_MIN_PARALLAX=10 px gate, tracking.cc:741-745). Returns
    (world points, inverse depth in ref frame, ok mask)."""
    pw = triangulate(r_wc0, t_wc0, r_wc1, t_wc1, xy0, xy1)
    d0 = depth_in_frame(pw, r_wc0, t_wc0)
    d1 = depth_in_frame(pw, r_wc1, t_wc1)

    # reprojection residuals in both views (normalized plane)
    pc0 = jnp.einsum("...ji,...j->...i", r_wc0, pw - t_wc0)
    pc1 = jnp.einsum("...ji,...j->...i", r_wc1, pw - t_wc1)
    e0 = jnp.linalg.norm(pc0[..., :2] / jnp.where(jnp.abs(pc0[..., 2:]) < 1e-9, 1e-9, pc0[..., 2:]) - xy0, axis=-1)
    e1 = jnp.linalg.norm(pc1[..., :2] / jnp.where(jnp.abs(pc1[..., 2:]) < 1e-9, 1e-9, pc1[..., 2:]) - xy1, axis=-1)

    ok = (
        (d0 > NEAREST_DEPTH) & (d0 < FARTHEST_DEPTH * depth_scale)
        & (d1 > NEAREST_DEPTH) & (d1 < FARTHEST_DEPTH * depth_scale)
        & (e0 < reproj_thresh) & (e1 < reproj_thresh)
    )
    if min_parallax > 0.0:
        r_c0c1 = jnp.einsum("...ji,...jk->...ik", r_wc0, r_wc1)
        par = parallax_rotation_compensated(xy0, xy1, r_c0c1)
        ok = ok & (par >= min_parallax)
    invdepth = 1.0 / jnp.where(ok, d0, DEFAULT_DEPTH)
    return pw, invdepth, ok


def parallax_rotation_compensated(xy0, xy1, r_c0c1):
    """Parallax with rotation removed (``tracking.cc:861-922``): rotate the
    second observation's bearing into the first view with the relative
    camera rotation, then measure the normalized-plane displacement."""
    h1 = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], axis=-1)
    h1_in_0 = jnp.einsum("...ij,...j->...i", r_c0c1, h1)
    xy1c = h1_in_0[..., :2] / h1_in_0[..., 2:]
    return jnp.linalg.norm(xy1c - xy0, axis=-1)
