"""Fundamental-matrix RANSAC outlier culling, fixed-shape and batched.

Capability parity with the reference's ``cv::findFundamentalMat(...,
cv::FM_RANSAC, reprojection_error_std, 0.99, status)`` call on undistorted
pixel coordinates (``tracking.cc:547-555``, applied when >= 15 tracked
points). TPU-first design: instead of OpenCV's sequential hypothesise-and-
verify loop with adaptive trial count, all hypotheses are evaluated at once
— H random 8-point subsets are sampled, each yields an F candidate via the
normalized 8-point algorithm (batched 9x9 ``eigh``), every candidate is
scored on every correspondence with the Sampson distance (one einsum-shaped
broadcast), and the best-supported candidate is refit on its inliers. One
jitted program, no data-dependent trip counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

N_HYPOTHESES = 128
MIN_POINTS = 15  # reference gate tracking.cc:546


def _normalize(pts, valid):
    """Hartley normalization: masked mean 0, RMS distance sqrt(2).
    Returns (pts_n, T) with pts_h_n = T @ pts_h."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1)) * w
    rms = jnp.maximum(d.sum() / n, 1e-9)
    s = jnp.sqrt(2.0) / rms
    T = jnp.array([[s, 0.0, -s * mean[0]], [0.0, s, -s * mean[1]], [0.0, 0.0, 1.0]],
                  pts.dtype)
    return (pts - mean) * s, T


def _eight_point(p0, p1):
    """F from 8 (or more, weighted) correspondences already normalized.
    p0, p1: (M, 2). Returns F (3,3) in the normalized frames (x1'F x0 = 0)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    one = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], -1)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    f = vecs[:, 0]
    F = f.reshape(3, 3)
    # rank-2 enforcement
    u, s, vt = jnp.linalg.svd(F)
    return (u * s.at[2].set(0.0)[None, :]) @ vt


def _sampson_sq(F, p0h, p1h):
    """Squared Sampson distance for each correspondence (homogeneous pts)."""
    Fx0 = p0h @ F.T          # (N,3)
    Ftx1 = p1h @ F           # (N,3)
    num = jnp.einsum("ni,ni->n", p1h, Fx0) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("n_hypotheses",))
def fundamental_ransac(pts0, pts1, valid, threshold, key,
                       n_hypotheses: int = N_HYPOTHESES):
    """RANSAC inlier mask for the epipolar constraint between two views.

    pts0, pts1: (N, 2) undistorted pixel coordinates; valid: (N,) bool;
    threshold: inlier Sampson distance in pixels (the reference passes
    ``reprojection_error_std``). Returns (inliers (N,) bool, F (3,3) in
    pixel coordinates). Invalid entries are never inliers.
    """
    pts0 = jnp.asarray(pts0, jnp.float64)
    pts1 = jnp.asarray(pts1, jnp.float64)
    n = pts0.shape[0]
    p0n, T0 = _normalize(pts0, valid)
    p1n, T1 = _normalize(pts1, valid)

    # sample 8 valid indices per hypothesis: valid indices packed first
    order = jnp.argsort(~valid)  # valid first (stable)
    m = jnp.maximum(valid.sum(), 1)
    u = jax.random.uniform(key, (n_hypotheses, 8))
    idx = order[jnp.minimum((u * m).astype(jnp.int32), m - 1)]

    F_n = jax.vmap(lambda i: _eight_point(p0n[i], p1n[i]))(idx)  # (H,3,3)
    # back to pixel coordinates: x1'^T F_n x0' = (T1 x1)^T F_n (T0 x0)
    F_px = jnp.einsum("ji,hjk,kl->hil", T1, F_n, T0)

    p0h = jnp.concatenate([pts0, jnp.ones((n, 1), pts0.dtype)], -1)
    p1h = jnp.concatenate([pts1, jnp.ones((n, 1), pts1.dtype)], -1)
    d2 = jax.vmap(lambda F: _sampson_sq(F, p0h, p1h))(F_px)  # (H,N)
    thr2 = jnp.asarray(threshold, pts0.dtype) ** 2
    inl = (d2 < thr2) & valid[None, :]
    best = jnp.argmax(inl.sum(-1))
    inliers = inl[best]

    # refit on the best consensus set (weighted normalized 8-point)
    w = inliers.astype(pts0.dtype)
    p0r, T0r = _normalize(pts0, inliers)
    p1r, T1r = _normalize(pts1, inliers)
    x0, y0 = p0r[:, 0] * w, p0r[:, 1] * w
    x1, y1 = p1r[:, 0], p1r[:, 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1 * w, y1 * x0, y1 * y0, y1 * w,
                   x0, y0, w], -1)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    Fr = vecs[:, 0].reshape(3, 3)
    u_, s_, vt_ = jnp.linalg.svd(Fr)
    Fr = (u_ * s_.at[2].set(0.0)[None, :]) @ vt_
    Fr_px = T1r.T @ Fr @ T0r
    d2r = _sampson_sq(Fr_px, p0h, p1h)
    inliers_r = (d2r < thr2) & valid
    # keep the refit only if it does not lose support
    better = inliers_r.sum() >= inliers.sum()
    inliers = jnp.where(better, inliers_r, inliers)
    F_out = jnp.where(better, Fr_px, F_px[best])
    return inliers, F_out
