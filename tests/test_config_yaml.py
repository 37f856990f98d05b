"""Reference gvins.yaml ingestion (config/gvins.yaml parsed like
fusion_ros.cc:71-102 / ic_gvins.cc:54-160 / tracking.cc:49-60)."""

import textwrap

from ic_gvins_tpu.engine.config import EngineConfig


YAML = textwrap.dedent("""
    initlength: 2
    imudatarate: 100
    iswithearth: true
    antlever: [-0.37, 0.008, 0.353]
    imumodel:
        arw: 0.2
        vrw: 0.3
        gbstd: 40.0
        abstd: 60.0
        corrtime: 2.0
    gnssthreshold: 15
    track_min_parallax: 15
    track_max_interval: 0.4
    track_max_features: 150
    reprojection_error_std: 2.0
    optimize_windows_size: 8
    optimize_num_iterations: 12
    optimize_estimate_extrinsic: true
    optimize_estimate_td: true
    cam0:
        intrinsic: [787.16, 787.39, 664.41, 519.51]
        distortion: [-0.0917, 0.0813, 0.00018, 0.00017]
        resolution: [1278, 1022]
        q_b_c: [0.497766, 0.502679, 0.501396, 0.498141]
        t_b_c: [0.074, -0.030, 0.128]
        td_b_c: 0.01
    odometer:
        use_odo: true
        lever: [0.3, 0.0, 0.9]
        odo_vrw: 0.04
""")


def test_from_yaml_reference_keys(tmp_path):
    p = tmp_path / "gvins.yaml"
    p.write_text(YAML)
    cfg = EngineConfig.from_yaml(str(p))
    assert cfg.initlength == 2.0
    assert cfg.imudatarate == 100.0
    assert cfg.antlever == (-0.37, 0.008, 0.353)
    assert cfg.imumodel.arw == 0.2 and cfg.imumodel.corrtime == 2.0
    assert cfg.gnssthreshold == 15.0
    assert cfg.track_max_features == 150
    assert cfg.optimize_windows_size == 8
    assert cfg.optimize_estimate_td is True
    # q_b_c converted from the reference's (x, y, z, w) to (w, x, y, z)
    assert cfg.cam.q_b_c == (0.498141, 0.497766, 0.502679, 0.501396)
    assert cfg.cam.td_b_c == 0.01
    assert cfg.odo.use_odo and cfg.odo.lever == (0.3, 0.0, 0.9)
    assert cfg.odo.odo_vrw == 0.04
