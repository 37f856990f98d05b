"""Native (C++) host-runtime components, loaded via ctypes.

Build with ``make -C ic_gvins_tpu/native`` (or ``python -m
ic_gvins_tpu.native.build``). Falls back to the pure-Python implementations
in ``engine/estimator.py`` when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libicgvins_native.so")


_SOURCES = ("imu_buffer.cpp", "fileio.cpp", "csv.cpp")


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -shared)."""
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    stale = force or not os.path.exists(_SO) or any(
        os.path.getmtime(_SO) < os.path.getmtime(s) for s in srcs
    )
    if stale:
        subprocess.check_call(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", *srcs, "-o", _SO]
        )
    return _SO


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        build()  # no-op when the .so is newer than every source
    except Exception:
        if not os.path.exists(_SO):
            return None
    lib = ctypes.CDLL(_SO)
    lib.imu_buffer_create.restype = ctypes.c_void_p
    lib.imu_buffer_create.argtypes = [ctypes.c_double]
    lib.imu_buffer_destroy.argtypes = [ctypes.c_void_p]
    lib.imu_buffer_size.restype = ctypes.c_int64
    lib.imu_buffer_size.argtypes = [ctypes.c_void_p]
    lib.imu_buffer_append.restype = ctypes.c_int64
    lib.imu_buffer_append.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.imu_buffer_drop_before.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.imu_buffer_last_time.restype = ctypes.c_double
    lib.imu_buffer_last_time.argtypes = [ctypes.c_void_p]
    lib.imu_buffer_export.restype = ctypes.c_int64
    lib.imu_buffer_export.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.imu_buffer_slice.restype = ctypes.c_int64
    lib.imu_buffer_slice.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    dp = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.filesaver_create.restype = ctypes.c_void_p
    lib.filesaver_create.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
    lib.filesaver_dumpn.restype = ctypes.c_int64
    lib.filesaver_dumpn.argtypes = [ctypes.c_void_p, dp, ctypes.c_int64]
    lib.filesaver_flush.restype = ctypes.c_int
    lib.filesaver_flush.argtypes = [ctypes.c_void_p]
    lib.filesaver_close.argtypes = [ctypes.c_void_p]
    lib.fileloader_open.restype = ctypes.c_void_p
    lib.fileloader_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
    lib.fileloader_read.restype = ctypes.c_int64
    lib.fileloader_read.argtypes = [ctypes.c_void_p, dp, ctypes.c_int64]
    lib.fileloader_close.argtypes = [ctypes.c_void_p]
    lib.csv_scan.restype = ctypes.c_int
    lib.csv_scan.argtypes = [ctypes.c_char_p, i64p, i64p]
    lib.csv_load.restype = ctypes.c_int64
    lib.csv_load.argtypes = [ctypes.c_char_p, dp, ctypes.c_int64, ctypes.c_int64]
    _LIB = lib
    return lib


class NativeImuBuffer:
    """ctypes wrapper over the C++ ring buffer; drop-in for _ImuBuffer."""

    def __init__(self, nominal_dt: float = 0.005):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.imu_buffer_create(nominal_dt)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.imu_buffer_destroy(self._h)
            self._h = None

    def append(self, t, dt, dtheta, dvel):
        dth = np.ascontiguousarray(dtheta, np.float64)
        dv = np.ascontiguousarray(dvel, np.float64)
        return self._lib.imu_buffer_append(
            self._h, float(t), float(dt),
            dth.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            dv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def drop_before(self, t):
        self._lib.imu_buffer_drop_before(self._h, float(t))

    def export_arrays(self):
        """(time [n], dt [n], dtheta [n,3], dvel [n,3]) of every stored
        sample (checkpoint serialization)."""
        n = len(self)
        time = np.empty(n, np.float64)
        dt = np.empty(n, np.float64)
        dtheta = np.empty((n, 3), np.float64)
        dvel = np.empty((n, 3), np.float64)
        p = ctypes.POINTER(ctypes.c_double)
        got = self._lib.imu_buffer_export(
            self._h, n, time.ctypes.data_as(p), dt.ctypes.data_as(p),
            dtheta.ctypes.data_as(p), dvel.ctypes.data_as(p),
        )
        assert got == n
        return time, dt, dtheta, dvel

    @property
    def last_time(self):
        return self._lib.imu_buffer_last_time(self._h)

    def __len__(self):
        return int(self._lib.imu_buffer_size(self._h))

    def slice_between(self, t0, t1, n_pad, min_dt=1e-4):
        """Returns numpy (time [n_pad], dt [n_pad], dtheta [n_pad,3],
        dvel [n_pad,3]) zero-padded; raises if capacity is exceeded."""
        time = np.empty(n_pad, np.float64)
        dt = np.empty(n_pad, np.float64)
        dtheta = np.empty((n_pad, 3), np.float64)
        dvel = np.empty((n_pad, 3), np.float64)
        p = ctypes.POINTER(ctypes.c_double)
        n = self._lib.imu_buffer_slice(
            self._h, float(t0), float(t1), n_pad, float(min_dt),
            time.ctypes.data_as(p), dt.ctypes.data_as(p),
            dtheta.ctypes.data_as(p), dvel.ctypes.data_as(p),
        )
        if n < 0:
            raise ValueError(f"IMU slice exceeds capacity {n_pad}")
        return time, dt, dtheta, dvel


class NativeFileSaver:
    """ctypes wrapper over the C++ columnar writer (fileio.cpp); byte-
    compatible with ``engine.fileio.FileSaver`` (filesaver.cc:51-66)."""

    def __init__(self, path: str, columns: int, mode: int = 0):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self.path, self.columns, self.mode = path, int(columns), mode
        self._h = self._lib.filesaver_create(
            path.encode(), self.columns, int(mode)
        )
        if not self._h:
            raise OSError(f"cannot open {path}")

    def dump(self, row) -> None:
        self.dumpn(np.asarray(row, np.float64).reshape(1, -1))

    def dumpn(self, rows) -> None:
        rows = np.ascontiguousarray(rows, np.float64).reshape(-1, self.columns)
        n = self._lib.filesaver_dumpn(
            self._h, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rows.shape[0],
        )
        if n != rows.shape[0]:
            raise OSError(f"short write to {self.path}")

    def flush(self) -> None:
        self._lib.filesaver_flush(self._h)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.filesaver_close(self._h)
            self._h = None

    __del__ = close

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeFileLoader:
    """ctypes wrapper over the C++ columnar reader (fileio.cpp)."""

    _CHUNK = 4096

    def __init__(self, path: str, columns: int, mode: int = 0):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.path, self.columns, self.mode = path, int(columns), mode
        self._h = self._lib.fileloader_open(
            path.encode(), self.columns, int(mode)
        )
        if not self._h:
            raise OSError(f"cannot open {path}")
        self._buf = np.zeros((0, self.columns), np.float64)
        self._pos = 0

    def _refill(self) -> bool:
        out = np.empty((self._CHUNK, self.columns), np.float64)
        n = self._lib.fileloader_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._CHUNK,
        )
        if n < 0:
            raise ValueError(f"{self.path}: malformed row")
        self._buf, self._pos = out[:n], 0
        return n > 0

    def load(self):
        if self._pos >= len(self._buf) and not self._refill():
            return None
        row = self._buf[self._pos].copy()
        self._pos += 1
        return row

    def load_all(self) -> np.ndarray:
        chunks = [self._buf[self._pos:]]
        while self._refill():
            chunks.append(self._buf)
        self._buf = np.zeros((0, self.columns), np.float64)
        self._pos = 0
        return np.concatenate(chunks, axis=0)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.fileloader_close(self._h)
            self._h = None

    __del__ = close

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_numeric_table(path: str) -> np.ndarray | None:
    """Fast C++ parse of a numeric CSV/whitespace table (csv.cpp), or None
    when the native library is unavailable (caller falls back to numpy)."""
    lib = load()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.csv_scan(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc == -1:
        raise OSError(f"cannot read {path}")
    if rc != 0:
        return None  # ragged table: let numpy produce its usual error
    out = np.empty((rows.value, cols.value), np.float64)
    n = lib.csv_load(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value, cols.value,
    )
    if n != rows.value:
        return None
    return out
