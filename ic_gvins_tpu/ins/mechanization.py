"""INS mechanization as a pure step + ``lax.scan`` kernel.

Capability parity with the reference mechanization (``misc.cc:174-229``):
bias-compensated two-sample coning/sculling integration with optional
Earth-rotation (Coriolis + rotating-frame) compensation, and the
re-mechanization pass that replays the IMU window from an updated state
(``misc.cc:231-284``) — which here is just the same scan from a new initial
state (no mutation, no threads).

Whether Earth terms are applied is decided by the *value* of
``params.iewn`` (pass zeros to disable): this keeps a single traced program
for both configurations instead of two compiled variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import rotation as rot
from ..data.types import ImuSeq, IntegrationParams, NavState


def compensate_bias(dtheta, dvel, dt, bg, ba):
    """Remove bias increments: dtheta - dt*bg, dvel - dt*ba."""
    return dtheta - dt[..., None] * bg, dvel - dt[..., None] * ba


def coning_sculling(dtheta_pre, dvel_pre, dtheta_cur, dvel_cur):
    """Two-sample coning/sculling corrected increments (``misc.cc:197-199``)."""
    dvfb = (
        dvel_cur
        + 0.5 * jnp.cross(dtheta_cur, dvel_cur)
        + (1.0 / 12.0)
        * (jnp.cross(dtheta_pre, dvel_cur) + jnp.cross(dvel_pre, dtheta_cur))
    )
    dtheta = dtheta_cur + (1.0 / 12.0) * jnp.cross(dtheta_pre, dtheta_cur)
    return dvfb, dtheta


def mechanize_step(
    params: IntegrationParams,
    state: NavState,
    imu_pre: tuple[jax.Array, jax.Array, jax.Array],  # (dt, dtheta, dvel)
    imu_cur: tuple[jax.Array, jax.Array, jax.Array],
    time_cur: jax.Array,
) -> NavState:
    """One mechanization step from ``state`` through the interval of
    ``imu_cur`` (uses ``imu_pre`` only for the coning/sculling terms)."""
    dt_pre, dth_pre, dv_pre = imu_pre
    dt_cur, dth_cur, dv_cur = imu_cur

    dth_pre, dv_pre = compensate_bias(dth_pre, dv_pre, dt_pre, state.bg, state.ba)
    dth_cur, dv_cur = compensate_bias(dth_cur, dv_cur, dt_cur, state.bg, state.ba)

    dt = dt_cur
    dvfb, dtheta = coning_sculling(dth_pre, dv_pre, dth_cur, dv_cur)

    # Coriolis + gravity term; with iewn == 0 this reduces to gravity*dt and
    # qnn == identity, recovering the earth-off branch (misc.cc:217-223).
    dv_cor_g = (params.gravity - 2.0 * jnp.cross(params.iewn, state.v)) * dt
    qnn = rot.rotvec_to_quat(-params.iewn * dt)

    body_dv = rot.quat_rotate(state.q, dvfb)
    dvel = 0.5 * (body_dv + rot.quat_rotate(qnn, body_dv)) + dv_cor_g

    q_new = rot.quat_normalize(
        rot.quat_mul(qnn, rot.quat_mul(state.q, rot.rotvec_to_quat(dtheta)))
    )
    p_new = state.p + dt * state.v + 0.5 * dt * dvel
    v_new = state.v + dvel

    return NavState(time=time_cur, p=p_new, q=q_new, v=v_new, bg=state.bg, ba=state.ba)


def mechanize_scan(params: IntegrationParams, state0: NavState, imu: ImuSeq) -> NavState:
    """Mechanize through an entire increment series; returns the batched
    states at each IMU epoch (leading axis = imu.n). The first sample of
    ``imu`` seeds the coning/sculling predecessor of the second, matching the
    reference convention that sample 0 carries the state at its own time.

    Replaces both the per-sample hot loop (``ic_gvins.cc:275-311``) and the
    redo-mechanization replay (``misc.cc:231-284``).
    """

    def body(carry, x):
        state, prev = carry
        cur = (x.dt, x.dtheta, x.dvel)
        new_state = mechanize_step(params, state, prev, cur, x.time)
        return (new_state, cur), new_state

    first = (imu.dt[0], imu.dtheta[0], imu.dvel[0])
    rest = ImuSeq(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:])
    (_, _), states = jax.lax.scan(body, (state0, first), rest, unroll=8)
    # Prepend state0 stamped at the first IMU epoch.
    head = state0._replace(time=imu.time[0])
    return jax.tree.map(
        lambda h, s: jnp.concatenate([h[None], s], axis=0), head, states
    )


def interpolate_imu(time0, imu_time, imu_dt, imu_dtheta, imu_dvel, t):
    """Split one IMU increment interval [time0, imu_time] at time t into the
    left part ending at t. Returns (dt_left, dtheta_left, dvel_left) and
    (dt_right, dtheta_right, dvel_right) by linear scaling (``misc.cc:311-328``)."""
    scale = jnp.clip((imu_time - t) / imu_dt, 0.0, 1.0)
    left = (imu_dt - (imu_time - t), imu_dtheta * (1 - scale), imu_dvel * (1 - scale))
    right = (imu_time - t, imu_dtheta * scale, imu_dvel * scale)
    return left, right


def pose_interpolate(state0: NavState, state1: NavState, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Interpolate (p, q) between two states at time t (``misc.cc:108-123``)."""
    scale = (t - state0.time) / (state1.time - state0.time)
    dp = state1.p - state0.p
    dq = rot.quat_mul(rot.quat_inv(state1.q), state0.q)
    rvec = rot.quat_to_rotvec(dq) * scale
    q = rot.quat_normalize(rot.quat_mul(state0.q, rot.quat_inv(rot.rotvec_to_quat(rvec))))
    return state0.p + dp * scale, q


def detect_zero_velocity(
    dtheta: jax.Array, dvel: jax.Array, rate: float,
    gyr_threshold: float = 0.002, acc_threshold: float = 0.1,
):
    """Windowed std-dev zero-velocity detector (``misc.cc:386-438``).

    Returns (is_zero_velocity, mean_increments[6]). Thresholds are the
    reference constants (``misc.h:75-76``)."""
    inc = jnp.concatenate([dtheta, dvel], axis=-1)  # [N, 6]
    mean = jnp.mean(inc, axis=0)
    std = jnp.sqrt(jnp.mean((inc - mean) ** 2, axis=0)) * rate
    ok_gyr = jnp.all(std[:3] < gyr_threshold)
    ok_acc = jnp.all(std[3:] < acc_threshold)
    return jnp.logical_and(ok_gyr, ok_acc), mean
