"""Full GVINS pipeline: raw images + IMU + GNSS -> trajectory.

The top-level integration the reference's ROS node provides
(``fusion_ros.cc`` + the GVINS thread pipeline), as a deterministic host
loop: IMU and GNSS go straight to the estimator; each camera frame is
INS-predicted (``MISC::getCameraPoseFromInsWindow`` parity via
``Estimator.predicted_state``), tracked by the KLT front-end, and the
tracked normalized observations feed the estimator's keyframe logic.
"""

from __future__ import annotations

import numpy as np

from ..common import rotation as rot
from ..vision import camera as cam_mod
from .config import EngineConfig
from .estimator import Estimator
from .frontend import Frontend


class Pipeline:
    def __init__(self, cfg: EngineConfig, use_pallas: bool | None = None,
                 use_clahe: bool = True, drawer=None, cell: int | None = None):
        self.cfg = cfg
        self.est = Estimator(cfg)
        cam = cam_mod.Camera.create(
            cfg.cam.intrinsic, cfg.cam.distortion, cfg.cam.resolution
        )
        if cell is None:
            # detection grid sized so the cell count comfortably exceeds
            # the feature budget (the reference uses 200 px blocks on
            # 1278 px imagery, tracking.h:112 — ~6 features per block;
            # a fixed 64 px cell starves small-resolution cameras)
            w, h = cfg.cam.resolution
            cell = 64
            while cell > 16 and (w // cell) * (h // cell) < cfg.track_max_features:
                cell //= 2
        self.frontend = Frontend(
            cam,
            max_features=cfg.track_max_features,
            cell=cell,
            use_pallas=use_pallas,
            use_clahe=use_clahe,
            check_histogram=cfg.track_check_histogram,
        )
        # optional visualization sink (parity DrawerRviz: the reference
        # engine forwards tracked points / poses / landmarks to a drawer,
        # ic_gvins.cc:173-175 + tracking.cc's drawer updates)
        self.drawer = drawer
        self._n_fixed_pushed = 0

    def add_imu(self, t, dt, dtheta, dvel):
        self.est.add_imu(t, dt, dtheta, dvel)

    def set_origin_blh(self, blh):
        self.est.set_origin_blh(blh)

    def add_gnss(self, t, p_local, std):
        self.est.add_gnss(t, p_local, std)

    def add_image(self, t, img):
        """Track the frame and feed observations to the estimator."""
        import time as _time

        q_wc = p_wc = None
        state = self.est.predicted_state(t)
        if state is not None:
            # full predicted camera pose: the front-end seeds LK for mapped
            # landmarks by full reprojection (tracking.cc:367-378) and for
            # the rest by rotation prediction (tracking.cc:464-479).
            # numpy math: eager device quaternion ops would each pay a
            # dispatch at camera rate
            from .estimator import _np_quat_mul, _np_quat_rotate

            sq = np.asarray(state.q)
            q_wc = _np_quat_mul(sq, self.est._npw("ext_q"))
            p_wc = np.asarray(state.p) + _np_quat_rotate(
                sq, self.est._npw("ext_p")
            )
        t0 = _time.perf_counter()
        ids, uv, vel = self.frontend.process(
            t, img, q_wc=q_wc, p_wc=p_wc,
            lm_lookup=self.est.landmark_positions,
        )
        track_ms = (_time.perf_counter() - t0) * 1e3
        n_log = len(self.est.track_log)
        if self.est.state != 0 and len(ids):
            # TRACK_LOST recovery: the re-initialized frame becomes a fresh
            # keyframe (parity ic_gvins.cc:566-568); all its features are
            # new anchors, INS bridged the visual outage
            force = True if self.frontend.track_lost else None
            if force:
                from ..common.logging import LOGW

                LOGW(f"tracking lost at t={t:.3f}; re-initialized front-end")
            self.est.add_frame_observations(t, ids, uv, vel, force_kf=force)
            if len(self.est.track_log) > n_log:  # this frame made a keyframe
                self.est.track_log[-1]["cost_ms"] = round(track_ms, 3)
        if self.drawer is not None:
            self._push_drawer(t, img)

    def _push_drawer(self, t, img):
        """Forward the frame's tracking/map/pose state to the drawer
        (the reference's updateTrackedMapPoints/updateTrackedRefPoints/
        updateFrame/updateMap/addNewFixedMappoint calls)."""
        fe, est, d = self.frontend, self.est, self.drawer
        in_map = np.array(
            [fid in est.lm_slot for fid in fe.last_tracked_ids], bool
        )
        types = np.array(
            [est.lm_type[est.lm_slot[fid]]
             for fid in fe.last_tracked_ids[in_map]], np.int32
        )
        d.update_tracked_mappoints(
            fe.last_prev_pts[in_map], fe.last_cur_pts[in_map], types
        )
        d.update_tracked_refpoints(
            fe.last_prev_pts[~in_map], fe.last_cur_pts[~in_map]
        )
        d.update_frame(img)
        s = est.predicted_state(t) or est.last_node_state
        if s is not None:
            d.update_odometry(t, np.asarray(s.p) + est.origin, np.asarray(s.q))
        while self._n_fixed_pushed < len(est.fixed_mappoints):
            d.add_new_fixed_mappoint(est.fixed_mappoints[self._n_fixed_pushed])
            self._n_fixed_pushed += 1

    def trajectory(self):
        return self.est.trajectory()
