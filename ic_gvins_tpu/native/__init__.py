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


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -shared)."""
    src = os.path.join(_DIR, "imu_buffer.cpp")
    if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", _SO]
        )
    return _SO


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        try:
            build()
        except Exception:
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
    lib.imu_buffer_slice.restype = ctypes.c_int64
    lib.imu_buffer_slice.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
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
