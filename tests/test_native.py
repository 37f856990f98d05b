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
