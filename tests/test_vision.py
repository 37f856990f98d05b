import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.vision import camera as cam_mod
from ic_gvins_tpu.vision import detector, klt, pyramid, triangulation


def make_camera():
    return cam_mod.Camera.create(
        [787.16, 787.39, 664.4, 519.5],
        [-0.0917, 0.0813, 0.00018, 0.00017],
        [1278, 1022],
    )


def random_texture(h, w, seed=0, scale=16):
    """Smooth random texture: bilinear-upsampled noise grid."""
    rng = np.random.RandomState(seed)
    coarse = rng.rand(h // scale + 2, w // scale + 2) * 255
    ys = np.arange(h) / scale
    xs = np.arange(w) / scale
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    ay = (ys - y0)[:, None]
    ax = (xs - x0)[None, :]
    img = (
        coarse[y0][:, x0] * (1 - ay) * (1 - ax)
        + coarse[y0][:, x0 + 1] * (1 - ay) * ax
        + coarse[y0 + 1][:, x0] * ay * (1 - ax)
        + coarse[y0 + 1][:, x0 + 1] * ay * ax
    )
    # add fine detail so corners exist
    fine = rng.rand(h, w) * 40
    return (img + fine).astype(np.float32)


def shift_image(img, dx, dy):
    """Bilinear shift: output(y, x) = img(y - dy, x - dx)."""
    h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return klt._bilinear(jnp.asarray(img), yy - dy, xx - dx)


def test_camera_distort_roundtrip():
    cam = make_camera()
    xy = jnp.array([[0.1, -0.2], [0.3, 0.25], [0.0, 0.0], [-0.4, 0.1]])
    xy2 = cam_mod.undistort(cam, cam_mod.distort(cam, xy))
    np.testing.assert_allclose(xy, xy2, atol=1e-10)


def test_camera_pixel_roundtrip():
    cam = make_camera()
    pc = jnp.array([[0.5, -0.3, 4.0], [-1.0, 0.8, 10.0], [0.0, 0.0, 2.0]])
    uv = cam_mod.cam_to_pixel(cam, pc)
    back = cam_mod.pixel_to_cam(cam, uv)
    np.testing.assert_allclose(back, pc / pc[:, 2:], atol=1e-8)


def test_world_pixel_roundtrip():
    cam = make_camera()
    r = rot.euler_to_matrix(jnp.array([0.1, -0.2, 0.5]))
    t = jnp.array([10.0, -5.0, 2.0])
    pw = jnp.array([[15.0, -3.0, 10.0]])
    uv = cam_mod.world_to_pixel(cam, pw, r, t)
    depth = triangulation.depth_in_frame(pw, r, t)
    pw2 = cam_mod.pixel_to_world(cam, uv, depth, r, t)
    np.testing.assert_allclose(pw, pw2, atol=1e-6)


def test_lk_recovers_translation():
    img0 = random_texture(240, 320, seed=1)
    dx, dy = 3.7, -2.3
    img1 = np.asarray(shift_image(img0, dx, dy))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)

    pts0 = jnp.array(
        [[60.0, 80.0], [160.0, 120.0], [250.0, 200.0], [100.0, 60.0], [200.0, 100.0]]
    )
    valid = jnp.ones(5, bool)
    pts1, ok, fb = klt.lk_track_bidirectional(pyr0, pyr1, pts0, pts0, valid)
    assert bool(jnp.all(ok)), (ok, fb)
    flow = pts1 - pts0
    np.testing.assert_allclose(flow[:, 0], dx, atol=0.15)
    np.testing.assert_allclose(flow[:, 1], dy, atol=0.15)


def test_lk_large_motion_with_prediction():
    img0 = random_texture(240, 320, seed=2)
    dx, dy = 18.0, -11.0  # beyond single-level range, needs pyramid/initial flow
    img1 = np.asarray(shift_image(img0, dx, dy))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts0 = jnp.array([[80.0, 90.0], [180.0, 150.0], [240.0, 80.0]])
    # INS-style prediction: within a few px of the true location
    pred = pts0 + jnp.array([dx - 2.0, dy + 1.5])
    valid = jnp.ones(3, bool)
    pts1, ok, _ = klt.lk_track_bidirectional(pyr0, pyr1, pts0, pred, valid)
    assert bool(jnp.all(ok))
    flow = pts1 - pts0
    np.testing.assert_allclose(flow[:, 0], dx, atol=0.2)
    np.testing.assert_allclose(flow[:, 1], dy, atol=0.2)


def test_lk_rejects_mismatch():
    img0 = random_texture(240, 320, seed=3)
    img1 = random_texture(240, 320, seed=99)  # unrelated image
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts0 = jnp.array([[80.0, 90.0], [160.0, 120.0], [240.0, 180.0], [60.0, 200.0]])
    valid = jnp.ones(4, bool)
    _, ok, _ = klt.lk_track_bidirectional(pyr0, pyr1, pts0, pts0, valid)
    # most random matches must fail the forward-backward gate
    assert int(jnp.sum(ok)) <= 1


def test_triangulation_exact():
    # two views looking at points, exact observations -> exact recovery
    r0 = jnp.tile(jnp.eye(3), (4, 1, 1))
    t0 = jnp.zeros((4, 3))
    r1 = jnp.tile(rot.euler_to_matrix(jnp.array([0.0, -0.1, 0.05])), (4, 1, 1))
    t1 = jnp.tile(jnp.array([1.0, 0.2, 0.0]), (4, 1))
    pw = jnp.array(
        [[2.0, 1.0, 8.0], [-1.0, 0.5, 12.0], [0.5, -0.8, 20.0], [3.0, 2.0, 15.0]]
    )

    def project(r, t, p):
        pc = jnp.einsum("nji,nj->ni", r, p - t)
        return pc[:, :2] / pc[:, 2:]

    xy0 = project(r0, t0, pw)
    xy1 = project(r1, t1, pw)
    pw_est, invd, ok = triangulation.triangulate_checked(r0, t0, r1, t1, xy0, xy1)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(pw_est, pw, atol=1e-6)
    np.testing.assert_allclose(1.0 / invd, pw[:, 2], atol=1e-6)


def test_triangulation_rejects_no_parallax():
    # identical camera centers -> depth unobservable -> must be flagged
    r0 = jnp.tile(jnp.eye(3), (2, 1, 1))
    t0 = jnp.zeros((2, 3))
    pw = jnp.array([[1.0, 0.5, 10.0], [-2.0, 1.0, 30.0]])
    xy = pw[:, :2] / pw[:, 2:]
    _, _, ok = triangulation.triangulate_checked(r0, t0, r0, t0, xy, xy)
    assert not bool(jnp.any(ok))


def test_detector_finds_separated_corners():
    img = random_texture(256, 320, seed=5)
    none = jnp.zeros((1, 2))
    pts, score, ok = detector.detect_features(
        jnp.asarray(img), none, jnp.zeros(1, bool), cell=64, max_new=20
    )
    n_ok = int(jnp.sum(ok))
    assert n_ok >= 10
    # occupancy: re-detect with the found corners masked -> new ones keep distance
    pts2, _, ok2 = detector.detect_features(
        jnp.asarray(img), pts, ok, cell=64, max_new=20
    )
    d = jnp.linalg.norm(pts2[:, None, :] - pts[None, :, :], axis=-1)
    dmin = jnp.min(jnp.where(ok[None, :], d, jnp.inf), axis=1)
    assert float(jnp.min(jnp.where(ok2, dmin, jnp.inf))) >= detector.MASK_RADIUS - 1.0


def _corner_image(cx, cy, h=64, w=64, soft=1.5):
    """Checkerboard saddle at (cx, cy): by symmetry, the gradient-normal
    intersection (the cornerSubPix fixed point) is exactly the saddle."""
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    tx = np.tanh((xs - cx) / soft)
    ty = np.tanh((ys - cy) / soft)
    return (127.0 * (1.0 + tx * ty) + 1.0).astype(np.float32)


def test_corner_subpix_recovers_true_corner():
    cx, cy = 31.37, 30.62
    img = _corner_image(cx, cy)
    pts = jnp.asarray([[31.0, 31.0], [32.0, 30.0]], jnp.float32)
    ok = jnp.ones(2, bool)
    out = np.asarray(detector.corner_subpix(jnp.asarray(img), pts, ok))
    for p in out:
        assert abs(p[0] - cx) < 0.1 and abs(p[1] - cy) < 0.1


def test_corner_subpix_matches_opencv():
    cv2 = __import__("cv2")
    img = random_texture(128, 160, seed=11)
    none = jnp.zeros((1, 2))
    pts, _, ok = detector.detect_features(
        jnp.asarray(img), none, jnp.zeros(1, bool), cell=32, max_new=16
    )
    ours = np.asarray(detector.corner_subpix(jnp.asarray(img), pts, ok))
    ref = np.asarray(pts, np.float32).reshape(-1, 1, 2).copy()
    cv2.cornerSubPix(
        img.astype(np.uint8), ref, (5, 5), (-1, -1),
        (cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 20, 0.01),
    )
    ref = ref.reshape(-1, 2)
    sel = np.asarray(ok)
    # uint8 quantization + border handling differ slightly; both must agree
    # to a small fraction of a pixel on well-conditioned corners
    d = np.linalg.norm(ours[sel] - ref[sel], axis=1)
    assert np.median(d) < 0.25


def test_corner_subpix_invalid_points_unchanged():
    img = random_texture(64, 64, seed=3)
    pts = jnp.asarray([[10.0, 10.0], [40.0, 40.0]], jnp.float32)
    ok = jnp.asarray([False, True])
    out = np.asarray(detector.corner_subpix(jnp.asarray(img), pts, ok))
    assert np.allclose(out[0], [10.0, 10.0])


def test_lk_matmul_matches_gather_formulation():
    """The MXU two-hot-matmul LK must track like the gather-based pure-JAX
    LK (same math, different sampling formulation)."""
    import numpy as np
    import jax.numpy as jnp

    from ic_gvins_tpu.vision import klt, pyramid

    rng = np.random.RandomState(3)
    img0 = rng.rand(128, 160).astype(np.float32) * 255
    try:
        from scipy.ndimage import gaussian_filter

        img0 = gaussian_filter(img0, 2.0) * 4.0
    except ImportError:
        img0 = (img0[:-1, :-1] + img0[1:, :-1] + img0[:-1, 1:] + img0[1:, 1:]) / 4.0
        img0 = np.pad(img0, ((0, 1), (0, 1)), mode="edge")
    img1 = np.roll(img0, (2, 3), axis=(0, 1))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray(rng.rand(32, 2) * np.array([100.0, 68.0]) + 30.0,
                      jnp.float32)
    valid = jnp.ones(32, bool)

    p_ref, ok_ref = klt.lk_track(pyr0, pyr1, pts, pts, valid)
    p_mm, ok_mm = klt.lk_track_matmul(pyr0, pyr1, pts, pts, valid)
    both = np.asarray(ok_ref) & np.asarray(ok_mm)
    assert both.sum() >= 20
    d = np.linalg.norm(np.asarray(p_ref) - np.asarray(p_mm), axis=-1)
    assert float(d[both].max()) < 0.2, d[both].max()
    # both must find the true (3, 2) shift
    err = np.linalg.norm(
        np.asarray(p_mm) - (np.asarray(pts) + np.array([3.0, 2.0])), axis=-1
    )
    assert float(err[np.asarray(ok_mm)].mean()) < 0.1
