"""Pallas LK kernel: interpreter-mode parity with the pure-JAX tracker."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_vision import random_texture, shift_image

from ic_gvins_tpu.vision import klt, klt_pallas, pyramid


def test_pallas_lk_matches_reference_tracker():
    img0 = random_texture(240, 320, seed=7)
    dx, dy = 4.2, -3.1
    img1 = np.asarray(shift_image(img0, dx, dy))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts0 = jnp.array(
        [[60.0, 80.0], [160.0, 120.0], [250.0, 200.0], [100.0, 60.0]]
    )
    valid = jnp.ones(4, bool)

    ref_pts, ref_ok = klt.lk_track(pyr0, pyr1, pts0, pts0, valid)
    pal_pts, pal_ok = klt_pallas.lk_track_pallas(
        pyr0, pyr1, pts0, pts0, valid, interpret=True
    )
    assert bool(jnp.all(pal_ok))
    np.testing.assert_allclose(np.asarray(pal_pts), np.asarray(ref_pts), atol=0.05)
    flow = np.asarray(pal_pts) - np.asarray(pts0)
    np.testing.assert_allclose(flow[:, 0], dx, atol=0.2)
    np.testing.assert_allclose(flow[:, 1], dy, atol=0.2)


def test_pallas_lk_bidirectional_gate():
    img0 = random_texture(240, 320, seed=8)
    img1 = random_texture(240, 320, seed=9)
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts0 = jnp.array([[80.0, 90.0], [160.0, 120.0], [240.0, 180.0]])
    valid = jnp.ones(3, bool)
    _, ok, _ = klt_pallas.lk_track_bidirectional_pallas(
        pyr0, pyr1, pts0, pts0, valid, interpret=True
    )
    assert int(jnp.sum(ok)) <= 1
