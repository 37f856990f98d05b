"""Second-new keyframe removal + time-node merging.

Reference semantics: a frame past ``track_max_interval`` with parallax
below ``track_min_parallax`` becomes a KEYFRAME_REMOVE_SECOND_NEW
(``tracking.cc:281-284``) — it constrains one optimization round, then
``gvinsRemoveAllSecondNewFrame`` (ic_gvins.cc:1425-1445) drops it from the
map and ``removeUnusedTimeNode`` (ic_gvins.cc:788-823) removes its time
node, merging the adjacent IMU preintegrations.
"""

import numpy as np

from test_estimator import ate, run_sequence, small_cfg


def test_second_new_frames_do_not_accumulate():
    """With parallax gating impossible, every interval-triggered frame is
    second-new: keyframes must not accumulate and the solution stays at
    the GNSS noise floor."""
    cfg = small_cfg(track_min_parallax=1e9, track_max_interval=0.5)
    est, traj, params = run_sequence(
        cfg, duration=10.0, with_vision=True, frame_rate=5.0, n_landmarks=64
    )
    # every keyframe was removed right after its round
    assert est.n_keyframes <= 1, est.n_keyframes
    assert sum(est.node_is_kf) == est.n_keyframes
    rmse, mx = ate(est, traj, params, t_min=5.0)
    assert rmse < 0.15, (rmse, mx)


def test_remove_node_merges_preintegration():
    """Removing an interior node leaves the merged preintegration spanning
    exactly the union of the two intervals."""
    cfg = small_cfg()
    est, traj, params = run_sequence(cfg, duration=8.0, with_vision=False)
    n = est.n_nodes
    assert n >= 4
    i = n - 2  # interior node
    t_before = est.node_times[i - 1]
    t_after = est.node_times[i + 1]
    est._remove_node(i)
    assert est.n_nodes == n - 1
    assert abs(est.node_times[i] - t_after) < 1e-12
    dt = float(est.window.preint.dt[i - 1])
    assert abs(dt - (t_after - t_before)) < 0.02, (dt, t_after - t_before)
    assert bool(est.window.preint_valid[i - 1])
    # the engine keeps solving after the merge
    est._optimize_round()
    rmse, mx = ate(est, traj, params, t_min=4.0)
    assert rmse < 0.15, (rmse, mx)


def test_insert_gnss_node_mid_window():
    """A late-arriving GNSS fix strictly between two nodes splits the
    preintegration and gets its own node (insertNewGnssTimeNode,
    ic_gvins.cc:894-920)."""
    import jax.numpy as jnp

    from ic_gvins_tpu.data import simulator as sim

    cfg = small_cfg()
    est, traj, params = run_sequence(cfg, duration=8.0, with_vision=False)
    n = est.n_nodes
    k = n - 1
    t = 0.5 * (est.node_times[k - 1] + est.node_times[k])
    assert t - est.node_times[k - 1] > cfg.min_sync_interval
    from ic_gvins_tpu.common import rotation as rot

    s = sim.truth_state(traj, params, jnp.asarray(t))
    # antenna position = body position + R*antlever
    p = np.asarray(s.p + rot.quat_rotate(s.q, jnp.asarray(cfg.antlever)))
    est.add_gnss(t, p, np.array([0.05, 0.05, 0.05]))
    assert est.n_nodes == n + 1
    assert abs(est.node_times[k] - t) < 1e-12
    assert sorted(est.node_times) == est.node_times
    # both halves of the split interval re-preintegrated
    dt0 = float(est.window.preint.dt[k - 1])
    dt1 = float(est.window.preint.dt[k])
    assert abs(dt0 - (t - est.node_times[k - 1])) < 0.02
    assert abs(dt1 - (est.node_times[k + 1] - t)) < 0.02
    assert bool(est.window.gnss_valid[k])
    rmse, mx = ate(est, traj, params, t_min=4.0)
    assert rmse < 0.15, (rmse, mx)


def test_late_gnss_attaches_to_near_node():
    """A late fix within the sync interval of an existing node attaches to
    it with velocity compensation and 1.2x std (ic_gvins.cc:864-891)."""
    import jax.numpy as jnp

    from ic_gvins_tpu.common import rotation as rot
    from ic_gvins_tpu.data import simulator as sim

    cfg = small_cfg()
    est, traj, params = run_sequence(cfg, duration=8.0, with_vision=False)
    n = est.n_nodes
    k = n - 2
    t = est.node_times[k] - 0.01  # just before node k
    s = sim.truth_state(traj, params, jnp.asarray(t))
    p = np.asarray(s.p + rot.quat_rotate(s.q, jnp.asarray(cfg.antlever)))
    est.add_gnss(t, p, np.array([0.05, 0.05, 0.05]))
    assert est.n_nodes == n  # no new node
    assert bool(est.window.gnss_valid[k])
    assert np.allclose(np.asarray(est.window.gnss_std[k]), 0.06)
    # compensated position is within v*dt of the raw fix
    d = np.linalg.norm(np.asarray(est.window.gnss_p[k]) - p)
    vmax = float(np.linalg.norm(np.asarray(est.window.nodes.v[k])))
    assert d <= vmax * 0.0105 + 1e-9
