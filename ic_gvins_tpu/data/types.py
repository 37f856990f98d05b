"""Core data containers: fixed-shape pytrees (NamedTuples) for sensor data
and navigation state.

Mirrors the capability of the reference's ``types.h`` / ``integration_state.h``
but as SoA arrays so everything vmaps/scans: an ``ImuSeq`` holds a whole
increment series; ``NavState`` works both as a single state (trailing shapes)
and as a batch (leading axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ImuSeq(NamedTuple):
    """IMU increment series (dtheta = gyro increment, dvel = specific-force
    increment over dt), matching the reference ingest conversion
    (``fusion_ros.cc:145-150``: rate -> increment)."""

    time: jax.Array  # [N] end-of-interval timestamps (s)
    dt: jax.Array  # [N] interval lengths (s)
    dtheta: jax.Array  # [N, 3] rad
    dvel: jax.Array  # [N, 3] m/s

    @property
    def n(self) -> int:
        return self.time.shape[-1]

    def slice(self, start: int, size: int) -> "ImuSeq":
        return ImuSeq(
            jax.lax.dynamic_slice_in_dim(self.time, start, size, -1),
            jax.lax.dynamic_slice_in_dim(self.dt, start, size, -1),
            jax.lax.dynamic_slice_in_dim(self.dtheta, start, size, -2),
            jax.lax.dynamic_slice_in_dim(self.dvel, start, size, -2),
        )


class NavState(NamedTuple):
    """Full navigation state (local NED n-frame anchored at the station).

    q is the body->nav unit quaternion (scalar-first). Works batched with a
    leading axis on every field.
    """

    time: jax.Array  # scalar or [B]
    p: jax.Array  # (…,3) position in local n-frame (m)
    q: jax.Array  # (…,4) body->nav quaternion
    v: jax.Array  # (…,3) velocity in n-frame (m/s)
    bg: jax.Array  # (…,3) gyro bias (rad/s)
    ba: jax.Array  # (…,3) accel bias (m/s^2)

    @staticmethod
    def zero(dtype=jnp.float64) -> "NavState":
        return NavState(
            time=jnp.zeros((), dtype),
            p=jnp.zeros(3, dtype),
            q=jnp.array([1.0, 0, 0, 0], dtype),
            v=jnp.zeros(3, dtype),
            bg=jnp.zeros(3, dtype),
            ba=jnp.zeros(3, dtype),
        )

    def index(self, i) -> "NavState":
        return jax.tree.map(lambda x: x[i], self)


class Gnss(NamedTuple):
    """A GNSS fix already converted to the local n-frame at ingest
    (parity with ``ic_gvins.cc:239``)."""

    time: jax.Array
    p: jax.Array  # (…,3) position in local n-frame
    std: jax.Array  # (…,3) per-axis std (m)


class IntegrationParams(NamedTuple):
    """IMU noise model + environment, from config (``gvins.yaml:26-31``)."""

    gyr_arw: jax.Array  # rad/sqrt(s)
    acc_vrw: jax.Array  # m/s/sqrt(s)
    gyr_bias_std: jax.Array  # rad/s
    acc_bias_std: jax.Array  # m/s^2
    corr_time: jax.Array  # s (first-order Gauss-Markov correlation time)
    gravity: jax.Array  # (3,) n-frame gravity vector
    iewn: jax.Array  # (3,) earth rotation rate in n-frame (zeros if disabled)
