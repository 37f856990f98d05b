"""Front-end tests on rendered synthetic imagery."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.engine.frontend import Frontend
from ic_gvins_tpu.vision import camera as cam_mod

RES = (320, 240)
INTR = [240.0, 240.0, 160.0, 120.0]


def make_cam():
    return cam_mod.Camera.create(INTR, [0.0, 0.0, 0.0, 0.0], RES)


def setup_scene(seed=0, n_lms=120):
    params = sim.default_params(with_earth=False)
    traj = sim.car_trajectory(speed=5.0)
    key = jax.random.PRNGKey(seed)
    lms = sim.scatter_landmarks(traj, params, key, n_lms, 0.0, 8.0,
                                lateral=18.0, depth_range=(6.0, 35.0))
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    ext_p = jnp.zeros(3)
    return params, traj, lms, ext_p, ext_q


def cam_pose(traj, params, ext_p, ext_q, t):
    s = sim.truth_state(traj, params, jnp.asarray(t))
    t_wc = s.p + rot.quat_rotate(s.q, ext_p)
    q_wc = rot.quat_mul(s.q, ext_q)
    return t_wc, q_wc


def test_frontend_tracks_blobs_across_frames():
    params, traj, lms, ext_p, ext_q = setup_scene()
    cam = make_cam()
    fe = Frontend(cam, max_features=60, cell=40)

    times = [0.0, 0.1, 0.2, 0.3, 0.4]
    ids_seen = []
    for t in times:
        t_wc, q_wc = cam_pose(traj, params, ext_p, ext_q, t)
        img = sim.render_sprite_frame(INTR, RES, lms, t_wc, q_wc)
        ids, uv, vel = fe.process(t, img, q_wc=q_wc)
        ids_seen.append(set(map(int, ids)))

    # most features from frame 2 survive to frame 5
    surv = len(ids_seen[1] & ids_seen[-1]) / max(len(ids_seen[1]), 1)
    assert len(ids_seen[1]) >= 10
    assert surv > 0.6, (surv, len(ids_seen[1]))


def test_frontend_observations_match_projection():
    """Tracked normalized observations must match the true landmark
    projections to sub-pixel accuracy.

    subpix=False isolates detector+KLT accuracy: cornerSubPix-style
    refinement assumes corner imagery and is slightly biased on these
    overlapping Gaussian sprites (its own accuracy is covered by the
    cv2-parity tests in test_vision.py)."""
    params, traj, lms, ext_p, ext_q = setup_scene(seed=1)
    cam = make_cam()
    fe = Frontend(cam, max_features=60, cell=40, subpix=False)

    obs_by_t = {}
    for t in [0.0, 0.15, 0.3]:
        t_wc, q_wc = cam_pose(traj, params, ext_p, ext_q, t)
        img = sim.render_sprite_frame(INTR, RES, lms, t_wc, q_wc)
        ids, uv, vel = fe.process(t, img, q_wc=q_wc)
        obs_by_t[t] = (ids, uv, (t_wc, q_wc))

    # at the last frame, compare each tracked uv with the nearest landmark's
    # true normalized projection
    ids, uv, (t_wc, q_wc) = obs_by_t[0.3]
    pc = jax.vmap(lambda pw: rot.quat_rotate(rot.quat_inv(q_wc), pw - t_wc))(lms)
    z = np.asarray(pc[:, 2])
    uv_true = np.asarray(pc[:, :2]) / z[:, None]
    good = z > 1.0

    errs = []
    for x in uv:
        d = np.linalg.norm(uv_true[good] - x, axis=1)
        errs.append(d.min())
    errs = np.array(errs) * 240.0  # to pixels
    # majority of tracked features sit on true projections
    assert np.median(errs) < 0.7, np.median(errs)
