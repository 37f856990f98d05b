"""Fundamental-matrix RANSAC culling (parity: cv::findFundamentalMat
FM_RANSAC usage at tracking.cc:546-555)."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.vision.ransac import fundamental_ransac


def _two_view_scene(n=80, n_out=12, noise=0.2, seed=3):
    rng = np.random.default_rng(seed)
    # random 3D points in front of both cameras
    pw = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                   rng.uniform(4, 12, n)], -1)
    # cam0 at origin; cam1 translated + small rotation
    t = np.array([1.0, 0.15, 0.1])
    ang = 0.08
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    f, cx, cy = 400.0, 320.0, 240.0
    def proj(p):
        return np.stack([f * p[:, 0] / p[:, 2] + cx,
                         f * p[:, 1] / p[:, 2] + cy], -1)
    uv0 = proj(pw)
    uv1 = proj((pw - t) @ R)
    uv0 += rng.normal(0, noise, uv0.shape)
    uv1 += rng.normal(0, noise, uv1.shape)
    is_out = np.zeros(n, bool)
    out_idx = rng.choice(n, n_out, replace=False)
    is_out[out_idx] = True
    uv1[out_idx] += rng.uniform(8, 40, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return uv0, uv1, is_out


def test_ransac_separates_outliers():
    uv0, uv1, is_out = _two_view_scene()
    valid = np.ones(len(uv0), bool)
    inl, F = fundamental_ransac(uv0, uv1, jnp.asarray(valid), 1.5,
                                jax.random.PRNGKey(0))
    inl = np.asarray(inl)
    # every gross outlier culled; the vast majority of inliers kept
    assert not inl[is_out].any()
    assert inl[~is_out].mean() > 0.9
    # F has rank 2
    s = np.linalg.svd(np.asarray(F), compute_uv=False)
    assert s[2] < 1e-8 * s[0]


def test_ransac_respects_valid_mask():
    uv0, uv1, is_out = _two_view_scene()
    valid = np.ones(len(uv0), bool)
    valid[::4] = False
    inl, _ = fundamental_ransac(uv0, uv1, jnp.asarray(valid), 1.5,
                                jax.random.PRNGKey(1))
    inl = np.asarray(inl)
    assert not inl[~valid].any()
    keep = valid & ~is_out
    assert inl[keep].mean() > 0.9


def test_ransac_pure_rotation_keeps_points():
    # degenerate (no translation): all correspondences satisfy any epipolar
    # geometry through the infinite homography; nothing should be culled
    rng = np.random.default_rng(7)
    pw = np.stack([rng.uniform(-4, 4, 60), rng.uniform(-3, 3, 60),
                   rng.uniform(4, 12, 60)], -1)
    ang = 0.05
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    f, cx, cy = 400.0, 320.0, 240.0
    proj = lambda p: np.stack([f * p[:, 0] / p[:, 2] + cx,
                               f * p[:, 1] / p[:, 2] + cy], -1)
    uv0, uv1 = proj(pw), proj(pw @ R)
    inl, _ = fundamental_ransac(uv0, uv1, jnp.ones(60, bool), 1.5,
                                jax.random.PRNGKey(2))
    assert np.asarray(inl).mean() > 0.95
