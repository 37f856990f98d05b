"""Drawer parity: tracking-image annotation (trail + type-colored boxes,
drawer.cc:25-69), update API, and offline artifacts (drawer_rviz analog)."""

import numpy as np

from ic_gvins_tpu.engine.drawer import (
    COLOR_REF,
    COLOR_TRAIL,
    COLOR_TRIANGULATED,
    MAPPOINT_TRIANGULATED,
    Drawer,
    draw_tracking_image,
)


def test_draw_tracking_image_marks_features():
    img = np.full((120, 160), 128, np.uint8)
    rgb = draw_tracking_image(
        img,
        pts_map_prev=np.array([[40.0, 40.0]]),
        pts_map_cur=np.array([[50.0, 45.0]]),
        map_types=np.array([MAPPOINT_TRIANGULATED]),
        pts_ref_prev=np.array([[100.0, 80.0]]),
        pts_ref_cur=np.array([[110.0, 90.0]]),
    )
    assert rgb.shape == (120, 160, 3)
    # rectangle (small image -> half=7) around the map-tracked feature
    assert tuple(rgb[45 - 7, 50]) == COLOR_TRIANGULATED
    assert tuple(rgb[45 + 7, 50]) == COLOR_TRIANGULATED
    # blue rectangle around the ref-frame feature
    assert tuple(rgb[90 - 7, 110]) == COLOR_REF
    # trail line passes through the motion midpoint
    assert tuple(rgb[42, 45]) == COLOR_TRAIL or tuple(rgb[43, 45]) == COLOR_TRAIL
    # far corner untouched
    assert tuple(rgb[5, 5]) == (128, 128, 128)


def test_draw_tracking_image_clips_out_of_bounds():
    img = np.zeros((60, 80), np.uint8)
    rgb = draw_tracking_image(
        img,
        pts_ref_prev=np.array([[-20.0, -20.0], [300.0, 10.0]]),
        pts_ref_cur=np.array([[-5.0, 2.0], [79.0, 59.0]]),
    )
    assert rgb.shape == (60, 80, 3)  # no crash, clipped drawing


def test_drawer_state_and_artifacts(tmp_path):
    d = Drawer(keep_images=2)
    d.update_tracked_mappoints(
        np.array([[10.0, 10.0]]), np.array([[12.0, 11.0]]),
        np.array([MAPPOINT_TRIANGULATED]),
    )
    d.update_tracked_refpoints(np.zeros((0, 2)), np.zeros((0, 2)))
    img = d.update_frame(np.full((60, 80), 100, np.uint8))
    assert img.shape == (60, 80, 3)
    for k in range(3):
        d.update_frame(np.zeros((60, 80), np.uint8))
    assert len(d.images) == 2  # bounded retention
    d.update_odometry(0.0, [0.0, 0.0, 0.0])
    d.update_odometry(0.1, [1.0, 0.5, 0.0])
    d.add_new_fixed_mappoint([3.0, 4.0, 5.0])
    out = tmp_path / "viz"
    d.save_artifacts(str(out))
    files = {p.name for p in out.iterdir()}
    assert any(f.startswith("tracking_") for f in files)
    assert ("map.png" in files) or ("path.npy" in files)


def test_pipeline_pushes_drawer():
    """The pipeline forwards frontend tracking state to the drawer even
    before estimator initialization (images only; poses need INS)."""
    from ic_gvins_tpu.engine.config import EngineConfig
    from ic_gvins_tpu.engine.pipeline import Pipeline

    cfg = EngineConfig(
        max_nodes=8, max_landmarks=16, track_max_features=16,
        cam=type(EngineConfig().cam)(
            intrinsic=(100.0, 100.0, 64.0, 48.0),
            distortion=(0.0, 0.0, 0.0, 0.0),
            resolution=(128, 96),
        ),
    )
    d = Drawer()
    pipe = Pipeline(cfg, use_pallas=False, use_clahe=False, drawer=d)
    rng = np.random.RandomState(0)
    img0 = (rng.rand(96, 128) * 255).astype(np.float32)
    img1 = np.roll(img0, (1, 2), axis=(0, 1))
    pipe.add_image(0.0, img0)
    pipe.add_image(0.1, img1)
    assert len(d.images) >= 1
    assert d.images[-1].shape == (96, 128, 3)
