"""KAIST Complex Urban dataset ingestion (urban38/urban39 layout).

The reference consumes these sequences as rosbags through its ROS node
(``fusion_ros.cc:130-249``); this environment has no ROS and no dataset, so
this module implements the equivalent ingest directly from the dataset's
CSV layout (as published by the KAIST urban dataset):

* ``sensor_data/xsens_imu.csv``  — timestamp [ns], quaternion(4),
  euler(3), gyro(3) [rad/s], accel(3) [m/s^2], magnetometer(3)
* ``sensor_data/vrs_gps.csv``    — timestamp [ns], latitude [deg],
  longitude [deg], altitude [m], then solution/covariance fields (the
  x/y/z std columns are configurable via ``GpsColumns``)

Conversions mirror the reference ingest exactly:

* rate -> increment: dtheta = w*dt, dvel = a*dt (``fusion_ros.cc:145-150``)
* geodetic -> local NED n-frame anchored at the first fix
  (``Earth::global2local``, applied at ``ic_gvins.cc:239``)
* unix ns -> seconds (GPS week handling is in ``common/gpstime``)

Everything is plain NumPy on host (ingest is IO, not compute). Column
layouts are parameterized so variant exports load without code changes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..common import earth
from ..data.types import Gnss, ImuSeq


def _load_table(path: str, delimiter=",") -> np.ndarray:
    """Numeric table load: native C++ streaming parser (native/csv.cpp,
    ~20x np.loadtxt on the 400k-row urban IMU files) with numpy fallback."""
    try:
        from ..native import load_numeric_table

        out = load_numeric_table(path)
        if out is not None:
            return out
    except Exception:
        pass
    return np.loadtxt(path, delimiter=delimiter)


@dataclass
class ImuColumns:
    time: int = 0  # ns
    gyro: tuple = (8, 9, 10)  # rad/s
    accel: tuple = (11, 12, 13)  # m/s^2
    time_scale: float = 1e-9


@dataclass
class GpsColumns:
    time: int = 0  # ns
    lat: int = 1  # deg
    lon: int = 2  # deg
    alt: int = 3  # m
    std: tuple | None = None  # optional (sx, sy, sz) columns
    default_std: float = 0.5  # m, when no covariance columns
    time_scale: float = 1e-9


def load_imu_csv(path: str, cols: ImuColumns = ImuColumns()) -> ImuSeq:
    """Load an IMU rate CSV and convert to increments (jnp arrays)."""
    import jax.numpy as jnp

    raw = _load_table(path)
    t = raw[:, cols.time] * cols.time_scale
    gyro = raw[:, list(cols.gyro)]
    accel = raw[:, list(cols.accel)]
    dt = np.diff(t, prepend=t[0])
    dt[0] = 0.0  # leading seed sample
    dtheta = gyro * dt[:, None]
    dvel = accel * dt[:, None]
    return ImuSeq(
        time=jnp.asarray(t), dt=jnp.asarray(dt),
        dtheta=jnp.asarray(dtheta), dvel=jnp.asarray(dvel),
    )


def load_gps_csv(
    path: str,
    cols: GpsColumns = GpsColumns(),
    origin_blh: np.ndarray | None = None,
):
    """Load a GNSS CSV -> (Gnss in the local NED frame, origin_blh).

    The local frame is anchored at the first fix unless an origin is given
    (the reference anchors at its first accepted fix, ic_gvins.cc:233-239).
    """
    import jax.numpy as jnp

    raw = _load_table(path)
    if raw.ndim == 1:
        raw = raw[None]
    t = raw[:, cols.time] * cols.time_scale
    d2r = np.pi / 180.0
    blh = np.stack(
        [raw[:, cols.lat] * d2r, raw[:, cols.lon] * d2r, raw[:, cols.alt]], axis=1
    )
    if origin_blh is None:
        origin_blh = blh[0]
    local = np.asarray(
        earth.global_to_local(jnp.asarray(origin_blh), jnp.asarray(blh))
    )
    if cols.std is not None:
        std = raw[:, list(cols.std)]
    else:
        std = np.full((len(t), 3), cols.default_std)
    return (
        Gnss(time=jnp.asarray(t), p=jnp.asarray(local), std=jnp.asarray(std)),
        origin_blh,
    )


def load_sequence(root: str, imu_cols=ImuColumns(), gps_cols=GpsColumns()):
    """Load a KAIST-layout sequence directory:
    root/sensor_data/{xsens_imu.csv, vrs_gps.csv}."""
    imu = load_imu_csv(os.path.join(root, "sensor_data", "xsens_imu.csv"), imu_cols)
    gnss, origin = load_gps_csv(
        os.path.join(root, "sensor_data", "vrs_gps.csv"), gps_cols
    )
    return imu, gnss, origin


def image_timestamps(root: str, camera: str = "stereo_left"):
    """Image stamp list (root/sensor_data/<camera>.csv or stamp-named files
    in root/image/<camera>/)."""
    stamp_file = os.path.join(root, "sensor_data", f"{camera}_stamp.csv")
    if os.path.exists(stamp_file):
        return np.loadtxt(stamp_file) * 1e-9
    img_dir = os.path.join(root, "image", camera)
    if os.path.isdir(img_dir):
        names = sorted(os.listdir(img_dir))
        return np.array([float(os.path.splitext(n)[0]) * 1e-9 for n in names])
    raise FileNotFoundError(f"no image stamps under {root}")
