"""Engine configuration mirroring the reference YAML + promoted constants.

Every key of ``config/gvins.yaml`` has an equivalent here, plus the
hard-coded constants the survey flagged as "really config"
(``ic_gvins.h:120-141``, ``tracking.h:112-115``, ``misc.h:72-76``,
``mappoint.h:51-53``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

D2R = math.pi / 180.0


@dataclass
class CameraConfig:
    intrinsic: tuple = (787.16, 787.39, 664.4, 519.5)
    distortion: tuple = (-0.0917, 0.0813, 0.00018, 0.00017)
    resolution: tuple = (1278, 1022)
    q_b_c: tuple = (0.5, 0.5, 0.5, 0.5)  # (w, x, y, z) body<-camera
    t_b_c: tuple = (0.074, -0.030, 0.128)
    td_b_c: float = 0.0


@dataclass
class ImuModel:
    arw: float = 0.1  # deg/sqrt(hr)
    vrw: float = 0.1  # m/s/sqrt(hr)
    gbstd: float = 50.0  # deg/hr
    abstd: float = 50.0  # mGal
    corrtime: float = 1.0  # hr


@dataclass
class EngineConfig:
    # --- gvins.yaml keys ---
    initlength: float = 1.0  # s of IMU for initialization
    imudatarate: float = 200.0
    iswithearth: bool = True
    antlever: tuple = (0.0, 0.0, 0.0)
    imumodel: ImuModel = field(default_factory=ImuModel)
    gnssthreshold: float = 20.0  # max accepted GNSS std (m)
    track_min_parallax: float = 20.0  # px
    track_max_interval: float = 0.5  # s
    track_max_features: int = 200
    reprojection_error_std: float = 1.5  # px
    optimize_windows_size: int = 10  # keyframes
    optimize_num_iterations: int = 20
    optimize_estimate_extrinsic: bool = False
    optimize_estimate_td: bool = False
    cam: CameraConfig = field(default_factory=CameraConfig)

    # --- promoted constants (ic_gvins.h:120-141, misc.h, mappoint.h) ---
    gravity: float = 9.80  # NORMAL_GRAVITY
    min_align_velocity: float = 0.5  # m/s, GNSS/INS moving alignment
    min_sync_interval: float = 0.025  # s
    max_preint_length: float = 10.0  # s
    min_time_interval: float = 1e-4  # s
    gyr_bias_prior_std: float = 7200 * D2R / 3600  # 7200 deg/hr
    acc_bias_prior_std: float = 20000 * 1e-5  # 20000 mGal
    zupt_gyr_threshold: float = 0.002  # rad/s
    zupt_acc_threshold: float = 0.1  # m/s^2
    keyframe_min_interval: float = 0.08  # s (tracking.h:115)

    # --- fixed-capacity knobs of the TPU build (static shapes) ---
    max_nodes: int = 24  # window node slots (keyframes + GNSS nodes)
    max_landmarks: int = 192
    max_imu_per_interval: int = 512  # IMU samples per preintegration slice
    # Marginalization prior mode:
    #   "full"   — reference-parity Schur marginalization (information
    #              accumulates; can compound linearization bias on long runs)
    #   "anchor" — bounded continuity anchor on the new oldest node at its
    #              current estimate (gauge fixation + continuity, cannot
    #              compound; default)
    #   "none"   — no prior after sliding (GNSS-only anchoring)
    marg_prior_mode: str = "anchor"
    prior_forgetting: float = 1.0  # info discount/slide in "full" mode
    # "anchor" mode stds: [pos(3), att(3)] and [vel(3), bg(3), ba(3)]
    anchor_pose_std: tuple = (0.05, 0.05, 0.05, 0.3 * D2R, 0.3 * D2R, 1.0 * D2R)
    anchor_mix_std: tuple = (0.05, 0.05, 0.05, 3e-4, 3e-4, 3e-4, 3e-3, 3e-3, 3e-3)
    track_ref_lat_deg: float = 30.5  # latitude for iewn if no GNSS origin yet

    @property
    def node_dof_total(self) -> int:
        return self.max_nodes * 15 + 7 + self.max_landmarks
