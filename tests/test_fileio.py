"""Columnar FileSaver/FileLoader round-trips and the output-file parity
surface (mappoint.txt landmark cloud, geodetic gvins.nav)."""

import numpy as np
import pytest

from ic_gvins_tpu.engine.fileio import BINARY, TEXT, FileLoader, FileSaver


@pytest.mark.parametrize("mode", [TEXT, BINARY])
def test_fileio_roundtrip(tmp_path, mode):
    path = str(tmp_path / ("f.txt" if mode == TEXT else "f.bin"))
    rows = np.random.RandomState(0).randn(17, 5)
    with FileSaver(path, 5, mode) as fs:
        fs.dumpn(rows)
    with FileLoader(path, 5, mode) as fl:
        back = fl.load_all()
    tol = 1e-8 if mode == TEXT else 0.0
    np.testing.assert_allclose(back, rows, atol=tol)


def test_fileio_row_width_checked(tmp_path):
    fs = FileSaver(str(tmp_path / "f.txt"), 3)
    with pytest.raises(ValueError):
        fs.dump([1.0, 2.0])
    fs.close()


def test_fileloader_skips_comments(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("# header\n1 2\n  \n3 4  # trailing\n")
    with FileLoader(str(p), 2) as fl:
        rows = fl.load_all()
    np.testing.assert_allclose(rows, [[1, 2], [3, 4]])


def test_write_mappoints(tmp_path):
    from ic_gvins_tpu.engine.outputs import RunWriter

    w = RunWriter(str(tmp_path))
    pts = [np.array([1.0, 2.0, 3.0]), np.array([-4.0, 5.0, 6.0])]
    w.write_mappoints(pts)
    w.close()
    with FileLoader(str(tmp_path / "mappoint.txt"), 3) as fl:
        back = fl.load_all()
    np.testing.assert_allclose(back, np.stack(pts), atol=1e-8)


def test_fixed_mappoints_world_position():
    """Marginalized landmarks are recorded at their world positions
    (``ic_gvins.cc:1704``): chain uv/invdepth -> camera -> extrinsic ->
    anchor pose -> world, plus the f32 re-centering origin offset."""
    import jax.numpy as jnp

    from ic_gvins_tpu.common import rotation as rot
    from ic_gvins_tpu.engine.config import EngineConfig
    from ic_gvins_tpu.engine.estimator import Estimator

    cfg = EngineConfig(max_nodes=8, max_landmarks=8)
    est = Estimator(cfg)
    w = est.window
    ext_q = rot.rotvec_to_quat(jnp.asarray([0.1, -0.2, 0.3]))
    q0 = rot.rotvec_to_quat(jnp.asarray([0.02, 0.3, -0.1]))
    p0 = jnp.asarray([5.0, -2.0, 1.0])
    uv = jnp.asarray([0.12, -0.08])
    invd = 0.1  # 10 m depth
    slot = 3
    est.window = w._replace(
        nodes=w.nodes._replace(q=w.nodes.q.at[0].set(q0), p=w.nodes.p.at[0].set(p0)),
        ext_p=jnp.asarray([0.1, 0.0, -0.05]),
        ext_q=ext_q,
        lm_invdepth=w.lm_invdepth.at[slot].set(invd),
        lm_ref=w.lm_ref.at[slot].set(0),
        lm_valid=w.lm_valid.at[slot].set(True),
        obs_uv=w.obs_uv.at[slot, 0].set(uv),
        obs_valid=w.obs_valid.at[slot, 0].set(True),
    )
    est.origin = np.array([100.0, 200.0, 0.0])
    est._save_fixed_mappoints([slot])
    assert len(est.fixed_mappoints) == 1
    pc = jnp.asarray([uv[0], uv[1], 1.0]) / invd
    pb = rot.quat_rotate(ext_q, pc) + est.window.ext_p
    pw = rot.quat_rotate(q0, pb) + p0 + jnp.asarray(est.origin)
    np.testing.assert_allclose(est.fixed_mappoints[0], np.asarray(pw), atol=1e-9)


def test_nav_geodetic_output(tmp_path):
    """With an origin, gvins.nav carries lat/lon in degrees + height —
    round-trips through earth.pose_local_to_global (misc.cc:452-457)."""
    import jax.numpy as jnp

    from ic_gvins_tpu.common import earth
    from ic_gvins_tpu.data.types import NavState
    from ic_gvins_tpu.engine.outputs import RunWriter

    origin = np.array([0.532, 2.23, 40.0])  # lat rad, lon rad, h
    p_local = np.array([120.0, -35.0, 2.0])
    state = NavState(
        time=jnp.asarray(5.0),
        p=jnp.asarray(p_local),
        q=jnp.asarray([1.0, 0, 0, 0]),
        v=jnp.asarray([1.0, 0.5, 0.0]),
        bg=jnp.zeros(3),
        ba=jnp.zeros(3),
    )
    w = RunWriter(str(tmp_path), origin_blh=origin)
    w.write_nav(state, decimate=1)
    w.close()
    row = np.loadtxt(str(tmp_path / "gvins.nav"))
    blh_expect = np.asarray(
        earth.local_to_global(jnp.asarray(origin), jnp.asarray(p_local))
    )
    np.testing.assert_allclose(row[2], np.degrees(blh_expect[0]), atol=1e-7)
    np.testing.assert_allclose(row[3], np.degrees(blh_expect[1]), atol=1e-7)
    np.testing.assert_allclose(row[4], blh_expect[2], atol=1e-4)
    np.testing.assert_allclose(row[5:8], [1.0, 0.5, 0.0], atol=1e-8)
