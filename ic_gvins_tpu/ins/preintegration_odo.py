"""Odometer-augmented IMU preintegration (ODO / EARTH_ODO variants).

Capability parity with the reference odometer preintegration
(``preintegration/preintegration_odo.cc``, ``preintegration_earth_odo.cc``):
the 19-dim error state adds the preintegrated odometer displacement ``ds``
(3) and the odometer scale factor ``dsodo`` (1) to the 15-dim IMU state:

    [dp 0:3 | dv 3:6 | dtheta 6:9 | dbg 9:12 | dba 12:15 | ds 15:18 | dsodo 18]

noise (16): [gyro white, accel white, gyro bias RW, accel bias RW,
             odometer velocity white, scale RW].

Per step (``preintegration_odo.cc:206-221``, earth-compensated rotation per
``preintegration_earth_odo.cc:275-283``):

    ds += C_comp @ (cvb @ [odovel,0,0] * (1 + sodo) - R(dtheta) @ lodo + lodo)

where ``cvb`` is the odometer mounting DCM, ``lodo`` the lever arm, and
``C_comp`` the same Earth-rotation-compensated delta attitude used for the
velocity integration (identity compensation when ``iewn == 0`` recovers the
plain ODO variant — one code path for both, like ``preintegration.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import rotation as rot
from ..data.types import ImuSeq, IntegrationParams, NavState
from .mechanization import compensate_bias, coning_sculling
from .preintegration import sqrt_information

NUM_STATE = 19
NUM_NOISE = 16


class OdoParams(NamedTuple):
    cvb: jax.Array  # (3,3) odometer/vehicle -> body mounting DCM
    lodo: jax.Array  # (3,) odometer lever arm in body frame
    odo_vrw: jax.Array  # odometer velocity random walk (m/s/sqrt(s))
    odo_srw: jax.Array  # scale-factor random walk (1/sqrt(s))


class OdoPreintData(NamedTuple):
    dp: jax.Array
    dv: jax.Array
    dq: jax.Array
    ds: jax.Array  # (3,) preintegrated odometer displacement
    jac: jax.Array  # (19,19)
    cov: jax.Array  # (19,19)
    dt: jax.Array
    sum_dt_pn: jax.Array
    bg_ref: jax.Array
    ba_ref: jax.Array
    sodo_ref: jax.Array  # scale linearization point
    end_state: NavState


def noise_psd_odo(params: IntegrationParams, odo: OdoParams, dtype=None) -> jax.Array:
    arw2 = params.gyr_arw**2
    vrw2 = params.acc_vrw**2
    nbg = 2.0 * params.gyr_bias_std**2 / params.corr_time
    nba = 2.0 * params.acc_bias_std**2 / params.corr_time
    d = jnp.concatenate(
        [
            jnp.full(3, arw2), jnp.full(3, vrw2), jnp.full(3, nbg),
            jnp.full(3, nba), jnp.full(3, odo.odo_vrw**2),
            jnp.full(1, odo.odo_srw**2),
        ]
    )
    return jnp.diag(d.astype(dtype) if dtype else d)


def preintegrate_odo(
    params: IntegrationParams,
    odo: OdoParams,
    state0: NavState,
    sodo0: jax.Array,
    imu: ImuSeq,
    odovel: jax.Array,  # [N] odometer displacement increments per sample
) -> OdoPreintData:
    """Fused scan over IMU + odometer increments."""
    dtype = state0.p.dtype
    noise = noise_psd_odo(params, odo, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    q0 = state0.q
    iewn = params.iewn.astype(dtype)
    gravity = params.gravity.astype(dtype)
    corr_time = params.corr_time
    cvb = odo.cvb.astype(dtype)
    lodo = odo.lodo.astype(dtype)

    def step(carry, x):
        (p, v, q, dp, dv, dq, ds, J, P, sum_dt_pn, t_acc, prev) = carry
        imu_x, odv = x
        dt = imu_x.dt
        dth_cur, dv_cur = compensate_bias(
            imu_x.dtheta, imu_x.dvel, dt, state0.bg, state0.ba
        )
        dth_pre, dv_pre = prev
        dvfb, dtheta = coning_sculling(dth_pre, dv_pre, dth_cur, dv_cur)
        t_new = t_acc + dt

        # continuous state (same as the base scan)
        dv_cor_g = (gravity - 2.0 * jnp.cross(iewn, v)) * dt
        qnn = rot.rotvec_to_quat(-iewn * dt)
        body_dv = rot.quat_rotate(q, dvfb)
        dvel_abs = 0.5 * (body_dv + rot.quat_rotate(qnn, body_dv)) + dv_cor_g
        p_new = p + dt * v + 0.5 * dt * dvel_abs
        v_new = v + dvel_abs
        q_new = rot.quat_normalize(
            rot.quat_mul(qnn, rot.quat_mul(q, rot.rotvec_to_quat(dtheta)))
        )
        sum_dt_pn_new = sum_dt_pn + dt * p_new

        # delta state with mid-interval earth compensation
        qmid = rot.rotvec_to_quat(-iewn * (t_new - 0.5 * dt))
        q_comp = rot.quat_mul(
            rot.quat_inv(q0), rot.quat_mul(qmid, rot.quat_mul(q0, dq))
        )
        dvel_d = rot.quat_rotate(q_comp, dvfb)
        dp_new = dp + dt * dv + 0.5 * dt * dvel_d
        dv_new = dv + dvel_d

        # odometer displacement increment (odo.cc:212-215 with the
        # compensated rotation of earth_odo.cc:275-283)
        dsodo_vec = jnp.concatenate([odv[None], jnp.zeros(2, dtype)])
        s_inc = (
            cvb @ dsodo_vec * (1.0 + sodo0)
            - rot.quat_rotate(rot.rotvec_to_quat(dth_cur), lodo)
            + lodo
        )
        ds_new = ds + rot.quat_rotate(q_comp, s_inc)

        dq_new = rot.quat_normalize(rot.quat_mul(dq, rot.rotvec_to_quat(dtheta)))

        # Jacobian/covariance propagation
        qend = rot.rotvec_to_quat(-iewn * t_new)
        cbb0 = -rot.quat_to_matrix(
            rot.quat_mul(rot.quat_inv(q0), rot.quat_mul(qend, rot.quat_mul(q0, dq_new)))
        )
        cpos = -cbb0  # the positive compensated delta DCM

        phi = jnp.zeros((NUM_STATE, NUM_STATE), dtype)
        phi = phi.at[0:3, 0:3].set(eye3)
        phi = phi.at[0:3, 3:6].set(eye3 * dt)
        phi = phi.at[3:6, 3:6].set(eye3)
        phi = phi.at[3:6, 6:9].set(cbb0 @ rot.skew(dv_cur))
        phi = phi.at[3:6, 12:15].set(cbb0 * dt)
        phi = phi.at[6:9, 6:9].set(eye3 - rot.skew(dth_cur))
        phi = phi.at[6:9, 9:12].set(-eye3 * dt)
        phi = phi.at[9:12, 9:12].set(eye3 * (1.0 - dt / corr_time))
        phi = phi.at[12:15, 12:15].set(eye3 * (1.0 - dt / corr_time))
        stheta = cvb @ dsodo_vec * (1.0 + sodo0) - jnp.cross(dth_cur, lodo)
        phi = phi.at[15:18, 6:9].set(-cpos @ rot.skew(stheta))
        phi = phi.at[15:18, 9:12].set(-cpos @ rot.skew(lodo) * dt)
        phi = phi.at[15:18, 15:18].set(eye3)
        phi = phi.at[15:18, 18].set(cpos @ cvb @ dsodo_vec)
        phi = phi.at[18, 18].set(1.0)

        J_new = phi @ J

        gt = jnp.zeros((NUM_STATE, NUM_NOISE), dtype)
        gt = gt.at[3:6, 3:6].set(cbb0)
        gt = gt.at[6:9, 0:3].set(-eye3)
        gt = gt.at[9:12, 6:9].set(eye3)
        gt = gt.at[12:15, 9:12].set(eye3)
        gt = gt.at[15:18, 0:3].set(cpos @ rot.skew(lodo))
        gt = gt.at[15:18, 12:15].set(cpos @ cvb * (1.0 + sodo0))
        gt = gt.at[18, 15].set(1.0)

        gng = gt @ noise @ gt.T
        qk = 0.5 * dt * (phi @ gng + gng @ phi.T)
        P_new = phi @ P @ phi.T + qk

        return (
            p_new, v_new, q_new, dp_new, dv_new, dq_new, ds_new,
            J_new, P_new, sum_dt_pn_new, t_new, (dth_cur, dv_cur),
        ), None

    init = (
        state0.p, state0.v, state0.q,
        jnp.zeros(3, dtype), jnp.zeros(3, dtype), rot.quat_identity(dtype),
        jnp.zeros(3, dtype),
        jnp.eye(NUM_STATE, dtype=dtype), jnp.zeros((NUM_STATE, NUM_STATE), dtype),
        jnp.zeros(3, dtype), jnp.zeros((), dtype),
        compensate_bias(imu.dtheta[0], imu.dvel[0], imu.dt[0], state0.bg, state0.ba),
    )
    rest = (
        ImuSeq(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:]),
        odovel[1:],
    )
    (p, v, q, dp, dv, dq, ds, J, P, sum_dt_pn, t_acc, _), _ = jax.lax.scan(
        step, init, rest
    )
    end_state = NavState(
        time=state0.time + t_acc, p=p, q=q, v=v, bg=state0.bg, ba=state0.ba
    )
    return OdoPreintData(
        dp=dp, dv=dv, dq=dq, ds=ds, jac=J, cov=P, dt=t_acc,
        sum_dt_pn=sum_dt_pn, bg_ref=state0.bg, ba_ref=state0.ba,
        sodo_ref=sodo0, end_state=end_state,
    )


def preint_odo_residual(
    preint: OdoPreintData,
    state0: NavState,
    sodo0: jax.Array,
    state1: NavState,
    sodo1: jax.Array,
    params: IntegrationParams,
    whiten: bool = True,
) -> jax.Array:
    """19-dim residual (``preintegration_odo.cc:40-79`` + Earth corrections
    of ``preintegration_earth_odo.cc``; unified via iewn)."""
    dtype = state0.p.dtype
    iewn = params.iewn.astype(dtype)
    gravity = params.gravity.astype(dtype)
    W = rot.skew(iewn)
    T = preint.dt

    dbg = state0.bg - preint.bg_ref
    dba = state0.ba - preint.ba_ref
    dsodo = sodo0 - preint.sodo_ref

    dp_dbg = preint.jac[0:3, 9:12]
    dp_dba = preint.jac[0:3, 12:15]
    dv_dbg = preint.jac[3:6, 9:12]
    dv_dba = preint.jac[3:6, 12:15]
    dq_dbg = preint.jac[6:9, 9:12]
    ds_dbg = preint.jac[15:18, 9:12]
    ds_dsodo = preint.jac[15:18, 18]

    corrected_p = preint.dp + dp_dbg @ dbg + dp_dba @ dba
    corrected_v = preint.dv + dv_dbg @ dbg + dv_dba @ dba
    corrected_q = rot.quat_mul(preint.dq, rot.rotvec_to_quat(dq_dbg @ dbg))
    corrected_s = preint.ds + ds_dbg @ dbg + ds_dsodo * dsodo

    p_cor = 2.0 * W @ (preint.sum_dt_pn - T * state0.p)
    v_cor = 2.0 * W @ (state1.p - state0.p)
    qnn = rot.rotvec_to_quat(-iewn * T)

    dpn = state1.p - state0.p - state0.v * T - 0.5 * gravity * T * T + p_cor
    dvn = state1.v - state0.v - gravity * T + v_cor
    cnb0 = rot.quat_to_matrix(rot.quat_inv(state0.q))
    qb0b1 = rot.quat_mul(rot.quat_inv(state1.q), rot.quat_mul(qnn, state0.q))

    r = jnp.concatenate(
        [
            cnb0 @ dpn - corrected_p,
            cnb0 @ dvn - corrected_v,
            2.0 * rot.quat_mul(qb0b1, corrected_q)[1:],
            state1.bg - state0.bg,
            state1.ba - state0.ba,
            cnb0 @ (state1.p - state0.p) - corrected_s,
            (sodo1 - sodo0)[None],
        ]
    )
    if whiten:
        r = sqrt_information(preint.cov) @ r
    return r
