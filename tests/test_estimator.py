"""End-to-end engine tests: sensor streams -> trajectory, on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.engine.config import EngineConfig
from ic_gvins_tpu.engine.estimator import TRACKING_NORMAL, Estimator


def small_cfg(**kw):
    # one shared window geometry across all tests -> one jit compilation
    kw.setdefault("optimize_num_iterations", 10)
    kw.setdefault("max_nodes", 16)
    kw.setdefault("max_landmarks", 64)
    kw.setdefault("optimize_windows_size", 6)
    kw.setdefault("antlever", (0.1, -0.05, 0.2))
    return EngineConfig(**kw)


def run_sequence(cfg, duration=15.0, with_vision=False, gnss_std=0.05, seed=0,
                 imu_rate=200.0, frame_rate=10.0, gnss_rate=1.0, n_landmarks=96,
                 gnss_until=None, odo_sodo_true=None, imu_gap=None,
                 gnss_outage=None, mesh=None):
    params = sim.default_params(with_earth=cfg.iswithearth, lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory()
    key = jax.random.PRNGKey(seed)
    k_imu, k_gnss, k_lm, k_px = jax.random.split(key, 4)
    k_odo = jax.random.fold_in(key, 7)  # keep the original 4 streams intact

    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba = jnp.array([5e-3, -8e-3, 2e-3])
    t0 = 0.0
    imu = sim.simulate_imu(traj, params, t0, duration, imu_rate)
    imu = sim.corrupt_imu(imu, params, k_imu, bg, ba)
    antlever = jnp.asarray(cfg.antlever)
    gnss = sim.simulate_gnss(traj, params, antlever, t0, duration, gnss_rate,
                             std=gnss_std, key=k_gnss)

    frames = []
    if with_vision:
        ext_q = rot.matrix_to_quat(
            jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        )
        ext_p = jnp.array([0.1, 0.0, -0.05])
        n_frames = int(duration * frame_rate)
        ftimes = t0 + (jnp.arange(n_frames) + 1) / frame_rate
        lms = sim.scatter_landmarks(traj, params, k_lm, n_landmarks, t0, t0 + duration + 3.0)
        uv, vis = sim.project_landmarks(
            traj, params, lms, ftimes, ext_p, ext_q,
            noise_std=0.5 / 780.0, key=k_px,
        )
        uv = np.asarray(uv)
        vis = np.asarray(vis)
        for j in range(n_frames):
            ids = np.nonzero(vis[:, j])[0]
            frames.append((float(ftimes[j]), ids, uv[ids, j]))
        cam_cfg = (ext_p, ext_q)
    else:
        cam_cfg = None

    odo_t = odo_v = None
    if odo_sodo_true is not None:
        odo_t, odo_v = sim.simulate_odometer(
            traj, params, t0, duration, 50.0,
            sodo_true=odo_sodo_true, noise_std=0.02, key=k_odo,
        )
        odo_t, odo_v = np.asarray(odo_t), np.asarray(odo_v)

    est = Estimator(cfg)
    if mesh is not None:
        est.set_mesh(mesh)
    if cam_cfg is not None:
        est.window = est.window._replace(ext_p=cam_cfg[0], ext_q=cam_cfg[1])

    # feed events in time order
    gi, fi, oi = 0, 0, 0
    gt = np.asarray(gnss.time)
    gp = np.asarray(gnss.p)
    gs = np.asarray(gnss.std)
    t_last_fed = None
    for k in range(imu.n):
        t = float(imu.time[k])
        dt = float(imu.dt[k])
        if dt == 0.0:
            continue
        if imu_gap is not None and imu_gap[0] < t <= imu_gap[1]:
            continue  # sensor dropout: these samples never arrive
        if odo_t is not None:
            while oi < len(odo_t) and odo_t[oi] <= t:
                est.add_odo(odo_t[oi], odo_v[oi])
                oi += 1
        dth = np.asarray(imu.dtheta[k])
        dv = np.asarray(imu.dvel[k])
        if t_last_fed is not None and t - t_last_fed > 1.5 * dt:
            # the driver computes increments as rate * (time since last
            # received sample), so the post-gap sample spans the whole gap
            # (fusion_ros.cc:145-150)
            scale = (t - t_last_fed) / dt
            dth, dv, dt = dth * scale, dv * scale, t - t_last_fed
        est.add_imu(t, dt, dth, dv)
        t_last_fed = t
        while gi < len(gt) and gt[gi] <= t:
            ok = gnss_until is None or gt[gi] <= gnss_until
            if gnss_outage is not None and gnss_outage[0] <= gt[gi] < gnss_outage[1]:
                ok = False  # simulated outage window (fusion_ros.cc:199-211)
            if ok:
                est.add_gnss(float(gt[gi]), gp[gi], gs[gi])
            gi += 1
        while fi < len(frames) and frames[fi][0] <= t:
            ft, ids, fuv = frames[fi]
            est.add_frame_observations(ft, ids, fuv)
            fi += 1
    return est, traj, params


def ate(est, traj, params, t_min=2.0):
    times, ps, qs = est.trajectory()
    errs = []
    for t, p in zip(times, ps):
        if t < t_min:
            continue
        s = sim.truth_state(traj, params, jnp.asarray(t))
        errs.append(np.linalg.norm(p - np.asarray(s.p)))
    return float(np.sqrt(np.mean(np.square(errs)))), float(np.max(errs))


def test_estimator_gins_end_to_end():
    cfg = small_cfg()
    est, traj, params = run_sequence(cfg, duration=15.0, with_vision=False)
    assert est.state != 0, "initialization failed"
    assert est.n_nodes >= 3
    # exclude the settling phase right after coarse moving-alignment init
    # (real-time outputs; the reference behaves the same way)
    rmse, mx = ate(est, traj, params, t_min=5.0)
    # real-time (newest-node) output tracks GNSS noise level: sigma=0.05/axis
    # -> ~0.09 rms 3D; allow headroom for the stochastic realization
    assert rmse < 0.13, (rmse, mx)
    assert mx < 0.30, mx
    # biases stay bounded (full observability needs longer trajectories;
    # 15 s of GNSS-only leaves the gyro bias only weakly observable)
    bg_est = np.asarray(est.last_node_state.bg)
    assert np.linalg.norm(bg_est - np.array([2e-4, -1e-4, 3e-4])) < 1.5e-3


def test_estimator_gvins_end_to_end():
    cfg = small_cfg()
    est, traj, params = run_sequence(cfg, duration=10.0, with_vision=True,
                                     frame_rate=5.0, n_landmarks=64)
    assert est.state == TRACKING_NORMAL
    assert est.n_keyframes > 0
    rmse, mx = ate(est, traj, params, t_min=5.0)
    assert rmse < 0.13, (rmse, mx)
    # landmarks got created and tracked
    assert len(est.lm_slot) > 10


def test_estimator_gnss_outage_bridged_by_vision():
    """GNSS dies after 6 s; vision + IMU must keep drift bounded
    (the reference's GNSS-outage fault injection, fusion_ros.cc:199-211)."""
    cfg = small_cfg()
    est, traj, params = run_sequence(
        cfg, duration=12.0, with_vision=True, seed=3, gnss_until=6.0,
        frame_rate=5.0, n_landmarks=64,
    )
    assert est.state == TRACKING_NORMAL
    times, ps, _ = est.trajectory()
    late = times > 10.0
    assert late.any()
    errs = [
        np.linalg.norm(p - np.asarray(sim.truth_state(traj, params, jnp.asarray(t)).p))
        for t, p in zip(times[late], ps[late])
    ]
    # 6 s of GNSS-denied VIO on a smooth path: stay within a meter
    assert float(np.max(errs)) < 1.0, errs
