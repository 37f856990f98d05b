"""Tracking-lost recovery: a visual blackout resets the front-end, fresh
features re-anchor, and the pipeline keeps producing a solution (parity:
TRACK_LOST -> doResetTracking, tracking.cc:223-227/317-329; the INS-centric
design keeps the system alive through visual failure)."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.engine.frontend import Frontend
from ic_gvins_tpu.vision.camera import Camera

RES = (320, 240)
INTR = (240.0, 240.0, 160.0, 120.0)


def test_frontend_recovers_from_blackout():
    cam = Camera.create(INTR, (0.0, 0.0, 0.0, 0.0), RES)
    fe = Frontend(cam, max_features=60, cell=40, use_pallas=False,
                  use_clahe=False, fm_ransac=False)
    params = sim.default_params(with_earth=False)
    traj = sim.car_trajectory(speed=5.0)
    lms = sim.scatter_landmarks(traj, params, jax.random.PRNGKey(0),
                                160, 0.0, 8.0, lateral=24.0,
                                depth_range=(7.0, 40.0))
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )

    ids_before = None
    lost_flags = []
    counts = []
    for i in range(14):
        t = 0.4 + 0.1 * i
        s = sim.truth_state(traj, params, jnp.asarray(t))
        q_wc = rot.quat_mul(s.q, ext_q)
        if 5 <= i <= 6:
            img = jnp.zeros((RES[1], RES[0]))  # blackout frames
        else:
            img = sim.render_sprite_frame(INTR, RES, lms, s.p, q_wc)
        ids, uv, _ = fe.process(t, np.asarray(img), q_wc=q_wc)
        lost_flags.append(fe.track_lost)
        counts.append(len(ids))
        if i == 4:
            ids_before = set(map(int, ids))

    # blackout triggered the lost path at least once
    assert any(lost_flags[5:8]), lost_flags
    # recovered: tracking again with a healthy feature count
    assert counts[-1] > 20, counts
    assert not fe.track_lost
    # recovered features are fresh anchors (new ids, not stale ones)
    ids_after = set(map(int, fe.ids[fe.valid]))
    assert not (ids_after & ids_before), "stale ids survived the reset"
