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
class OdoConfig:
    """Wheel-odometer options (the reference's ODO / EARTH_ODO
    preintegration variants, ``preintegration.h:37-55``)."""

    use_odo: bool = False
    # odometer/vehicle -> body mounting euler angles (roll, pitch, yaw, rad)
    mount_euler: tuple = (0.0, 0.0, 0.0)
    lever: tuple = (0.0, 0.0, 0.0)  # odometer lever arm in body frame (m)
    odo_vrw: float = 0.05  # odometer velocity random walk (m/s/sqrt(s))
    odo_srw: float = 1e-4  # scale-factor random walk (1/sqrt(s))
    sodo_prior_std: float = 0.02  # soft zero-prior (imu_error_factor.h:45-91)
    estimate_sodo: bool = True


@dataclass
class EngineConfig:
    # --- gvins.yaml keys ---
    initlength: float = 1.0  # GINS preintegrations before vision joins (ic_gvins.cc:443)
    imudatarate: float = 200.0
    iswithearth: bool = True
    antlever: tuple = (0.0, 0.0, 0.0)
    imumodel: ImuModel = field(default_factory=ImuModel)
    gnssthreshold: float = 20.0  # max accepted GNSS std (m)
    track_min_parallax: float = 20.0  # px
    track_max_interval: float = 0.5  # s
    track_max_features: int = 200
    track_check_histogram: bool = False  # illumination-glitch frame gate
    reprojection_error_std: float = 1.5  # px
    optimize_windows_size: int = 10  # keyframes
    optimize_num_iterations: int = 20
    optimize_estimate_extrinsic: bool = False
    optimize_estimate_td: bool = False
    cam: CameraConfig = field(default_factory=CameraConfig)
    odo: OdoConfig = field(default_factory=OdoConfig)

    # --- promoted constants (ic_gvins.h:120-141, misc.h, mappoint.h) ---
    gravity: float = 9.80  # NORMAL_GRAVITY
    min_align_velocity: float = 0.5  # m/s, GNSS/INS moving alignment
    # Max acceptable heading std (rad) implied by the GNSS velocity vector
    # before moving alignment is allowed: atan(sigma_v/|v_h|) must be below
    # this, else initialization waits for more speed. TPU-build hardening —
    # the reference aligns at any speed >= 0.5 m/s and pins the resulting
    # (possibly garbage) heading under a fixed 1.5 deg prior.
    align_max_heading_std: float = 5.0 * D2R
    # Liveness fallback for the gate above: after this many rejected
    # moving-alignment attempts (platform never fast enough for the fix
    # noise), initialize anyway with the honestly-widened attitude prior
    # instead of waiting forever (advisor r4, estimator.py:578).
    align_max_rejects: int = 20
    # Vision joins only once the GINS phase is measurably steady (the
    # available newest-node GNSS chi2 history, up to the last 3 rounds,
    # all < 7.815 vs the base std) in addition to the initlength count —
    # see Estimator._dispatch_frame. The wait is bounded: after
    # vio_join_max_wait_rounds blocked attempts the join is forced so a
    # persistently-elevated chi2 (miscalibrated GNSS stds, multipath)
    # cannot keep the estimator GINS-only forever.
    vio_join_require_steady: bool = True
    vio_join_max_wait_rounds: int = 10
    # Measure optimize#1 / optimize#2 wall separately (reference records
    # three solver timecost columns, ic_gvins.cc:1054-1056). Off by
    # default: the split runs the two phases as two programs with a host
    # sync between them, which costs a dispatch round-trip per round —
    # the production path keeps both phases fused in ONE program.
    stat_phase_split: bool = False
    # Per-frame INS pose prediction on the host (f64 numpy mirror of the
    # mechanization scan) instead of a device dispatch per camera frame:
    # over a tunneled chip the dispatch RTT alone exceeds the whole
    # prediction's host cost. False = always use the device scan.
    host_predict: bool = True
    min_sync_interval: float = 0.025  # s
    max_preint_length: float = 10.0  # s
    min_time_interval: float = 1e-4  # s
    gyr_bias_prior_std: float = 7200 * D2R / 3600  # 7200 deg/hr
    acc_bias_prior_std: float = 20000 * 1e-5  # 20000 mGal
    zupt_gyr_threshold: float = 0.002  # rad/s
    zupt_acc_threshold: float = 0.1  # m/s^2
    keyframe_min_interval: float = 0.08  # s (tracking.h:115)
    nearest_depth: float = 1.0  # m (mappoint.h:51-53)
    farthest_depth: float = 200.0  # m
    # min rotation-compensated parallax (px) to triangulate a landmark
    # (TRACK_MIN_PARALLAX, tracking.h:113, gate at tracking.cc:741-745)
    triangulate_min_parallax: float = 10.0
    # triangulation reprojection gate in px (isGoodToTrack scale=1.0,
    # tracking.cc:756); None = reprojection_error_std
    triangulate_reproj_gate_px: float | None = None
    # IMU dropout repair: "split" (integral-preserving slicing; default) or
    # "repeat" (reference parity, ic_gvins.cc:191-203 — repeats the raw
    # increment unscaled). A/B: tests/test_ingest.py::test_imu_gap_repair_ab
    imu_gap_repair: str = "split"
    default_depth: float = 10.0  # m
    # Warm-up floor: minimum preintegrations before chi2/outlier culling and
    # the full two-phase round activate.  The effective gate is
    # max(warmup_min_preint, initlength), so configs with initlength > this
    # floor keep culling off for the whole GINS phase (parity with the
    # reference, which only culls once tracking started, ic_gvins.cc:443-446).
    warmup_min_preint: int = 5

    # --- fixed-capacity knobs of the TPU build (static shapes) ---
    use_native_imu_buffer: bool = True  # C++ ring buffer (native/imu_buffer.cpp)
    max_nodes: int = 24  # window node slots (keyframes + GNSS nodes)
    max_landmarks: int = 192
    max_imu_per_interval: int = 512  # IMU samples per preintegration slice
    # Marginalization prior mode:
    #   "full"   — reference-parity Schur marginalization (default; the
    #              round-1 "divergence" was a masking bug in the Schur
    #              correction term, fixed in factors/marginalization.py —
    #              soak-validated: 300 s with a 60 s GNSS outage holds
    #              0.06 m RMSE where "anchor" peaks at 4 m)
    #   "anchor" — bounded continuity anchor on the new oldest node at its
    #              current estimate (gauge fixation + continuity only)
    #   "none"   — no prior after sliding (GNSS-only anchoring)
    marg_prior_mode: str = "full"
    # GNSS chi2 reweight: True (default) = reference-parity in-place
    # compounding (gnss->std *= sqrt(chi2/thr), ic_gvins.cc:1275-1301).
    # The ratchet is the point: an inflated fix STAYS inflated even when
    # the state later drifts toward it (which shrinks its recomputed chi2).
    # False = the round-2 non-compounding recompute from the base std; the
    # A/B (tests/test_chi2_ab.py) measured it 4x worse under a persistent
    # 6 m-biased fix (3.86 m vs 0.94 m RMSE): as the bad fix drags the
    # state, the recomputed inflation RE-TIGHTENS and the drag runs away.
    chi2_compound: bool = True
    prior_forgetting: float = 1.0  # info discount/slide in "full" mode
    # "anchor" mode stds: [pos(3), att(3)] and [vel(3), bg(3), ba(3)]
    anchor_pose_std: tuple = (0.05, 0.05, 0.05, 0.3 * D2R, 0.3 * D2R, 1.0 * D2R)
    anchor_mix_std: tuple = (0.05, 0.05, 0.05, 3e-4, 3e-4, 3e-4, 3e-3, 3e-3, 3e-3)
    track_ref_lat_deg: float = 30.5  # latitude for iewn if no GNSS origin yet
    # Window re-centering for the f32 TPU path: when |p| of the oldest node
    # exceeds this after a slide, shift the whole window (nodes, GNSS,
    # preintegration position caches, prior linearization points) so the
    # oldest node is near the origin, accumulating the offset in f64 on the
    # host. All factor residuals depend only on position *differences*
    # (incl. the Earth Coriolis term via sum_dt_pn - dt*p0), so the shift is
    # algebraically exact. 0 disables; None = auto (on when x64 is off).
    recenter_threshold: float | None = None

    @property
    def node_dof_total(self) -> int:
        return self.max_nodes * 15 + 8 + self.max_landmarks

    # --- reference-compatible YAML ingestion ---

    # keys handled by the replay runner, not the engine (fusion_ros.cc)
    _RUNNER_KEYS = (
        "outputpath", "is_make_outputdir", "is_use_visualization",
        "isusegnssoutage", "gnssoutagetime",
    )

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        """Load a reference ``gvins.yaml`` (``config/gvins.yaml:1-83``,
        parsed by the reference at ``fusion_ros.cc:71-102``,
        ``ic_gvins.cc:54-160``, ``tracking.cc:49-60``) — a user of the
        reference can bring their config file unchanged. Note the
        reference stores ``q_b_c`` as (x, y, z, w); internally we use
        (w, x, y, z)."""
        import yaml

        with open(path) as f:
            y = yaml.safe_load(f)

        cfg = cls()
        for key in (
            "initlength", "imudatarate", "iswithearth", "gnssthreshold",
            "track_min_parallax", "track_max_interval", "track_max_features",
            "track_check_histogram",
            "reprojection_error_std", "optimize_windows_size",
            "optimize_num_iterations", "optimize_estimate_extrinsic",
            "optimize_estimate_td",
        ):
            if key in y:
                setattr(cfg, key, type(getattr(cfg, key))(y[key]))
        if "antlever" in y:
            cfg.antlever = tuple(float(v) for v in y["antlever"])
        if "imumodel" in y:
            m = y["imumodel"]
            cfg.imumodel = ImuModel(
                arw=float(m["arw"]), vrw=float(m["vrw"]),
                gbstd=float(m["gbstd"]), abstd=float(m["abstd"]),
                corrtime=float(m["corrtime"]),
            )
        if "cam0" in y:
            c = y["cam0"]
            qx, qy, qz, qw = (float(v) for v in c["q_b_c"])
            cfg.cam = CameraConfig(
                intrinsic=tuple(float(v) for v in c["intrinsic"]),
                distortion=tuple(float(v) for v in c["distortion"]),
                resolution=tuple(int(v) for v in c["resolution"]),
                q_b_c=(qw, qx, qy, qz),
                t_b_c=tuple(float(v) for v in c["t_b_c"]),
                td_b_c=float(c.get("td_b_c", 0.0)),
            )
        if "odometer" in y:
            o = y["odometer"]
            cfg.odo = OdoConfig(
                use_odo=bool(o.get("use_odo", True)),
                mount_euler=tuple(float(v) for v in o.get("mount_euler", (0, 0, 0))),
                lever=tuple(float(v) for v in o.get("lever", (0, 0, 0))),
                odo_vrw=float(o.get("odo_vrw", 0.05)),
                odo_srw=float(o.get("odo_srw", 1e-4)),
            )
        return cfg
