"""IMU preintegration with Earth-rotation compensation as one fused scan.

Capability parity with the reference preintegration subsystem
(``preintegration/preintegration_base.cc:39-84``,
``preintegration_normal.cc:183-254``, ``preintegration_earth.cc:205-334``),
re-designed for XLA:

* One unified code path covers both the NORMAL and EARTH variants: every
  Earth term degenerates to the NORMAL formula when ``iewn == 0`` (the
  rotation compensation quaternion becomes identity and the Coriolis
  corrections vanish), so the variant is selected by *data*, not by code.
* The whole per-interval integration — continuous state replay, delta
  state, 15x15 state-transition Jacobian, and covariance propagation with
  trapezoidal noise — is a single ``lax.scan`` step, so XLA fuses it into
  one on-device loop.
* Zero-padded IMU samples (dt == 0) are exact no-ops of the step function,
  so variable-length intervals are handled with static shapes and no masks.
* "Reintegration" after a bias update (``preintegration_base.cc:77-84``) is
  just calling :func:`preintegrate` again — the function is pure.

Error-state ordering (15): [dp 0:3, dv 3:6, dtheta 6:9, dbg 9:12, dba 12:15],
noise ordering (12): [gyro white, accel white, gyro bias RW, accel bias RW].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import rotation as rot
from ..data.types import ImuSeq, IntegrationParams, NavState
from .mechanization import compensate_bias, coning_sculling


class PreintData(NamedTuple):
    """Preintegrated measurement over one window interval.

    All fields batch with a leading axis (one entry per window interval).
    """

    dp: jax.Array  # (…,3) delta position in the b0 frame
    dv: jax.Array  # (…,3) delta velocity
    dq: jax.Array  # (…,4) delta attitude quaternion
    jac: jax.Array  # (…,15,15) d(delta)/d(error state at start), for bias correction
    cov: jax.Array  # (…,15,15) preintegration covariance
    dt: jax.Array  # (…,) total integration time
    sum_dt_pn: jax.Array  # (…,3) sum of dt_i * p_i for the Earth position Coriolis term
    bg_ref: jax.Array  # (…,3) gyro bias at linearization
    ba_ref: jax.Array  # (…,3) accel bias at linearization
    end_state: NavState  # continuous-state replay result at interval end


def noise_psd(params: IntegrationParams, dtype=None) -> jax.Array:
    """12x12 diagonal noise PSD (``preintegration_*.cc::setNoiseMatrix``)."""
    arw2 = params.gyr_arw**2
    vrw2 = params.acc_vrw**2
    nbg = 2.0 * params.gyr_bias_std**2 / params.corr_time
    nba = 2.0 * params.acc_bias_std**2 / params.corr_time
    d = jnp.concatenate(
        [jnp.full(3, x) for x in (arw2, vrw2, nbg, nba)]
    )
    return jnp.diag(d.astype(dtype) if dtype else d)


def preintegrate(
    params: IntegrationParams, state0: NavState, imu: ImuSeq
) -> PreintData:
    """Integrate an IMU increment series starting at ``state0``.

    ``imu`` must start with the sample *at* the interval start (used only as
    the coning predecessor, like the reference seeding ``imu_buffer_`` with
    ``imu0``); remaining samples advance the integration. Zero-padding
    (dt = dtheta = dvel = 0) is a no-op.
    """
    dtype = state0.p.dtype
    noise = noise_psd(params, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    q0 = state0.q
    iewn = params.iewn.astype(dtype)
    gravity = params.gravity.astype(dtype)
    corr_time = params.corr_time

    def step(carry, x):
        (p, v, q, dp, dv, dq, J, P, sum_dt_pn, t_acc, prev) = carry
        dt = x.dt
        dth_cur, dv_cur = compensate_bias(x.dtheta, x.dvel, dt, state0.bg, state0.ba)
        dth_pre, dv_pre = prev

        dvfb, dtheta = coning_sculling(dth_pre, dv_pre, dth_cur, dv_cur)

        t_new = t_acc + dt

        # --- continuous absolute state (earth.cc:216-242) ---
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

        # --- delta (preintegrated) state (earth.cc:244-256) ---
        # mid-interval earth-rotation compensation: q0^-1 exp(-w(t - dt/2)) q0 dq
        qmid = rot.rotvec_to_quat(-iewn * (t_new - 0.5 * dt))
        q_comp = rot.quat_mul(
            rot.quat_inv(q0), rot.quat_mul(qmid, rot.quat_mul(q0, dq))
        )
        dvel_d = rot.quat_rotate(q_comp, dvfb)
        dp_new = dp + dt * dv + 0.5 * dt * dvel_d
        dv_new = dv + dvel_d
        dq_new = rot.quat_normalize(rot.quat_mul(dq, rot.rotvec_to_quat(dtheta)))

        # --- Jacobian & covariance propagation (earth.cc:266-303) ---
        qend = rot.rotvec_to_quat(-iewn * t_new)
        cbb0 = -rot.quat_to_matrix(
            rot.quat_mul(rot.quat_inv(q0), rot.quat_mul(qend, rot.quat_mul(q0, dq_new)))
        )

        phi = jnp.zeros((15, 15), dtype)
        phi = phi.at[0:3, 0:3].set(eye3)
        phi = phi.at[0:3, 3:6].set(eye3 * dt)
        phi = phi.at[3:6, 3:6].set(eye3)
        phi = phi.at[3:6, 6:9].set(cbb0 @ rot.skew(dv_cur))
        phi = phi.at[3:6, 12:15].set(cbb0 * dt)
        phi = phi.at[6:9, 6:9].set(eye3 - rot.skew(dth_cur))
        phi = phi.at[6:9, 9:12].set(-eye3 * dt)
        phi = phi.at[9:12, 9:12].set(eye3 * (1.0 - dt / corr_time))
        phi = phi.at[12:15, 12:15].set(eye3 * (1.0 - dt / corr_time))

        J_new = phi @ J

        gt = jnp.zeros((15, 12), dtype)
        gt = gt.at[3:6, 3:6].set(cbb0)
        gt = gt.at[6:9, 0:3].set(-eye3)
        gt = gt.at[9:12, 6:9].set(eye3)
        gt = gt.at[12:15, 9:12].set(eye3)

        gng = gt @ noise @ gt.T
        qk = 0.5 * dt * (phi @ gng + gng @ phi.T)
        P_new = phi @ P @ phi.T + qk

        carry_new = (
            p_new, v_new, q_new, dp_new, dv_new, dq_new,
            J_new, P_new, sum_dt_pn_new, t_new, (dth_cur, dv_cur),
        )
        return carry_new, None

    init = (
        state0.p, state0.v, state0.q,
        jnp.zeros(3, dtype), jnp.zeros(3, dtype), rot.quat_identity(dtype),
        jnp.eye(15, dtype=dtype), jnp.zeros((15, 15), dtype),
        jnp.zeros(3, dtype), jnp.zeros((), dtype),
        compensate_bias(imu.dtheta[0], imu.dvel[0], imu.dt[0], state0.bg, state0.ba),
    )
    rest = ImuSeq(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:])
    (p, v, q, dp, dv, dq, J, P, sum_dt_pn, t_acc, _), _ = jax.lax.scan(step, init, rest)

    end_state = NavState(
        time=state0.time + t_acc, p=p, q=q, v=v, bg=state0.bg, ba=state0.ba
    )
    return PreintData(
        dp=dp, dv=dv, dq=dq, jac=J, cov=P, dt=t_acc, sum_dt_pn=sum_dt_pn,
        bg_ref=state0.bg, ba_ref=state0.ba, end_state=end_state,
    )


def sqrt_information(cov: jax.Array) -> jax.Array:
    """Upper-triangular sqrt information: chol(cov^-1)^T
    (``preintegration_*.cc::evaluate`` line 1: LLT of covariance inverse).

    The covariance diagonal spans ~1e-10 (angles) to ~1e-2 (position), so
    the inverse is computed on the diagonally-normalized correlation matrix
    (condition ~1e3 instead of ~1e8) — required for the f32 TPU path, and
    a strict improvement in f64. With cov = D·Cn·D (D = diag sqrt):
    chol(cov^-1)^T = chol(Cn^-1)^T · D^-1."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(cov, axis1=-2, axis2=-1), 1e-30))
    s = 1.0 / d
    cov_n = cov * s[..., :, None] * s[..., None, :]
    info_n = jnp.linalg.inv(cov_n)
    # Symmetrize before Cholesky for numerical safety.
    info_n = 0.5 * (info_n + jnp.swapaxes(info_n, -1, -2))
    u_n = jnp.swapaxes(jnp.linalg.cholesky(info_n), -1, -2)
    return u_n * s[..., None, :]


def preint_residual(
    preint: PreintData,
    state0: NavState,
    state1: NavState,
    params: IntegrationParams,
    whiten: bool = True,
) -> jax.Array:
    """15-dim preintegration residual (``preintegration_earth.cc:37-90``).

    With ``iewn == 0`` the Coriolis corrections vanish and this reduces to
    the NORMAL variant's residual (up to the attitude residual's sign, which
    is irrelevant to the cost). If ``whiten``, multiplies by the
    sqrt-information of the propagated covariance.
    """
    dtype = state0.p.dtype
    iewn = params.iewn.astype(dtype)
    gravity = params.gravity.astype(dtype)
    W = rot.skew(iewn)
    T = preint.dt

    dbg = state0.bg - preint.bg_ref
    dba = state0.ba - preint.ba_ref

    dp_dbg = preint.jac[0:3, 9:12]
    dp_dba = preint.jac[0:3, 12:15]
    dv_dbg = preint.jac[3:6, 9:12]
    dv_dba = preint.jac[3:6, 12:15]
    dq_dbg = preint.jac[6:9, 9:12]

    corrected_p = preint.dp + dp_dbg @ dbg + dp_dba @ dba
    corrected_v = preint.dv + dv_dbg @ dbg + dv_dba @ dba
    corrected_q = rot.quat_mul(preint.dq, rot.rotvec_to_quat(dq_dbg @ dbg))

    # Earth Coriolis corrections (zero when iewn == 0).
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
        ]
    )
    if whiten:
        r = sqrt_information(preint.cov) @ r
    return r
