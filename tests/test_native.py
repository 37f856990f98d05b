"""Native C++ IMU buffer: build, parity with the Python slicing."""

import numpy as np
import pytest

from ic_gvins_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def fill(buf, rate=200.0, t0=0.0, n=400):
    dt = 1.0 / rate
    rng = np.random.RandomState(0)
    for i in range(1, n + 1):
        t = t0 + i * dt
        buf.append(t, dt, rng.randn(3) * 1e-3, rng.randn(3) * 1e-2)


def test_native_roundtrip(lib):
    buf = native.NativeImuBuffer(0.005)
    fill(buf)
    assert len(buf) == 400
    assert abs(buf.last_time - 2.0) < 1e-9

    time, dt, dth, dv = buf.slice_between(0.5, 1.5, 256)
    n = int((dt > 0).sum())
    assert abs(time[0] - 0.5) < 1e-12 and dt[0] == 0.0
    # ~200 real increments + seed
    assert 199 <= n <= 201
    # increments must sum to the full interval
    np.testing.assert_allclose(dt.sum(), 1.0, atol=1e-9)
    assert abs(time[np.nonzero(dt)[0][-1]] - 1.5) < 1e-9
    # padding zeros
    assert np.all(dt[n + 1 :] == 0)


def test_native_boundary_interpolation(lib):
    buf = native.NativeImuBuffer(0.005)
    fill(buf)
    # boundaries between samples: increments get scaled
    time, dt, dth, dv = buf.slice_between(0.5025, 1.0025, 256)
    np.testing.assert_allclose(dt.sum(), 0.5, atol=1e-9)


def test_native_gap_repair(lib):
    buf = native.NativeImuBuffer(0.005)
    buf.append(0.005, 0.005, np.ones(3) * 1e-3, np.ones(3) * 1e-2)
    # a 25 ms gap: repair should synthesize ~4 filler samples
    added = buf.append(0.030, 0.005, np.ones(3) * 1e-3, np.ones(3) * 1e-2)
    assert added >= 4  # >= 3 synthesized fillers + the real sample
    assert len(buf) >= 5


def test_native_matches_python_slicer(lib):
    from ic_gvins_tpu.engine.estimator import _ImuBuffer

    nat = native.NativeImuBuffer(0.005)
    py = _ImuBuffer()
    rng = np.random.RandomState(1)
    dt = 0.005
    for i in range(1, 401):
        t = i * dt
        th, dv = rng.randn(3) * 1e-3, rng.randn(3) * 1e-2
        nat.append(t, dt, th, dv)
        py.append(t, dt, th, dv)

    tN, dtN, thN, dvN = nat.slice_between(0.5, 1.5, 256)
    seq = py.slice_between(0.5, 1.5, 256)
    np.testing.assert_allclose(np.asarray(seq.dt), dtN, atol=1e-12)
    np.testing.assert_allclose(np.asarray(seq.dtheta), thN, atol=1e-12)
    np.testing.assert_allclose(np.asarray(seq.dvel), dvN, atol=1e-12)


def test_native_fileio_matches_python(lib, tmp_path):
    """C++ FileSaver/FileLoader are byte-compatible with the Python layer
    (both mirror filesaver.cc:51-66 / fileloader.cc)."""
    from ic_gvins_tpu.engine import fileio

    rows = np.random.RandomState(2).randn(23, 4)
    for mode, name in [(fileio.TEXT, "t"), (fileio.BINARY, "b")]:
        p_nat = str(tmp_path / f"nat_{name}")
        p_py = str(tmp_path / f"py_{name}")
        with native.NativeFileSaver(p_nat, 4, mode) as fs:
            fs.dumpn(rows)
        with fileio.PyFileSaver(p_py, 4, mode) as fs:
            fs.dumpn(rows)
        assert open(p_nat, "rb").read() == open(p_py, "rb").read()
        with native.NativeFileLoader(p_nat, 4, mode) as fl:
            back_nat = fl.load_all()
        with fileio.PyFileLoader(p_py, 4, mode) as fl:
            back_py = fl.load_all()
        np.testing.assert_array_equal(back_nat, back_py)


def test_native_fileio_row_width_checked(lib, tmp_path):
    fs = native.NativeFileSaver(str(tmp_path / "f.txt"), 3)
    with pytest.raises(ValueError):
        fs.dump([1.0, 2.0])
    fs.close()


def test_native_fileloader_comments_and_rowwise(lib, tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("# header\n1 2\n  \n3 4  # trailing\n")
    with native.NativeFileLoader(str(p), 2) as fl:
        np.testing.assert_allclose(fl.load(), [1, 2])
        np.testing.assert_allclose(fl.load(), [3, 4])
        assert fl.load() is None


def test_native_csv_parser(lib, tmp_path):
    """Streaming strtod parser matches np.loadtxt on KAIST-style tables."""
    rng = np.random.RandomState(3)
    table = np.concatenate(
        [rng.randint(0, 2**62, (50, 1)).astype(np.float64), rng.randn(50, 16)],
        axis=1,
    )
    p = str(tmp_path / "imu.csv")
    np.savetxt(p, table, delimiter=",", fmt="%.17g")
    out = native.load_numeric_table(p)
    np.testing.assert_allclose(out, np.loadtxt(p, delimiter=","), rtol=0, atol=0)
    # ragged tables fall back to numpy (returns None)
    (tmp_path / "r.csv").write_text("1,2\n3\n")
    assert native.load_numeric_table(str(tmp_path / "r.csv")) is None
