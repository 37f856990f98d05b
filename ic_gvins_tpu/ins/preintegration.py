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
        (p, v, q, dp, dv, dq, sum_dt_pn, t_acc, prev) = carry
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

        # Per-step transition + noise emitted as scan OUTPUTS; the 15x15
        # propagation itself happens in a log-depth pairwise reduction
        # after the scan (see below) — the sequential scan keeps only the
        # cheap small-vector state work.
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

        gt = jnp.zeros((15, 12), dtype)
        gt = gt.at[3:6, 3:6].set(cbb0)
        gt = gt.at[6:9, 0:3].set(-eye3)
        gt = gt.at[9:12, 6:9].set(eye3)
        gt = gt.at[12:15, 9:12].set(eye3)

        gng = gt @ noise @ gt.T
        qk = 0.5 * dt * (phi @ gng + gng @ phi.T)

        carry_new = (
            p_new, v_new, q_new, dp_new, dv_new, dq_new,
            sum_dt_pn_new, t_new, (dth_cur, dv_cur),
        )
        return carry_new, (phi, qk)

    init = (
        state0.p, state0.v, state0.q,
        jnp.zeros(3, dtype), jnp.zeros(3, dtype), rot.quat_identity(dtype),
        jnp.zeros(3, dtype), jnp.zeros((), dtype),
        compensate_bias(imu.dtheta[0], imu.dvel[0], imu.dt[0], state0.bg, state0.ba),
    )
    rest = ImuSeq(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:])
    (p, v, q, dp, dv, dq, sum_dt_pn, t_acc, _), (phis, qks) = jax.lax.scan(
        step, init, rest, unroll=8
    )

    # --- Jacobian & covariance via log-depth pairwise composition ---
    # The per-step recursions J_{k+1} = phi_k J_k and
    # P_{k+1} = phi_k P_k phi_k^T + qk_k compose associatively:
    # (phi_a, Q_a) then (phi_b, Q_b)  ==  (phi_b phi_a,
    # phi_b Q_a phi_b^T + Q_b). A 128-step sequential scan of 15x15
    # matmuls is latency-bound on TPU; log2(n) rounds of BATCHED matmuls
    # run on the MXU instead. Zero-padded steps emit (I, 0) — the
    # composition identity — so static-shape padding stays a no-op.
    n_steps = phis.shape[0]
    n_pow2 = 1 << (n_steps - 1).bit_length() if n_steps > 1 else 1
    if n_pow2 != n_steps:
        pad = n_pow2 - n_steps
        phis = jnp.concatenate(
            [phis, jnp.tile(jnp.eye(15, dtype=dtype), (pad, 1, 1))], 0
        )
        qks = jnp.concatenate([qks, jnp.zeros((pad, 15, 15), dtype)], 0)
    while phis.shape[0] > 1:
        pa, pb = phis[0::2], phis[1::2]
        qa, qb = qks[0::2], qks[1::2]
        phis = jnp.einsum("nij,njk->nik", pb, pa)
        qks = jnp.einsum("nij,njk,nlk->nil", pb, qa, pb) + qb
    J = phis[0]
    P = qks[0]

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


def _so3_right_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) right Jacobian Jr(phi): exp(phi + d) = exp(phi) exp(Jr d)."""
    th2 = jnp.sum(phi * phi)
    th = jnp.sqrt(jnp.maximum(th2, 1e-30))
    K = rot.skew(phi)
    small = th2 < 1e-12
    a = jnp.where(small, 0.5, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-30))
    b = jnp.where(
        small, 1.0 / 6.0, (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-30)
    )
    return jnp.eye(3, dtype=phi.dtype) - a * K + b * (K @ K)


def preint_residual_jac(
    preint: PreintData,
    state0: NavState,
    state1: NavState,
    params: IntegrationParams,
):
    """UNWHITENED residual + ANALYTIC 15x30 Jacobian w.r.t. the boxplus
    deltas [node0 (dp,dtheta,dv,dbg,dba) | node1 (...)] — the reference's
    closed-form factor Jacobians (``preintegration_normal.cc:73-142``,
    ``preintegration_earth.cc:92-200``) rederived for this build's
    right-multiplicative manifold, replacing a 31-tangent jacfwd per
    interval per LM iteration. Exact to first order (includes the SO(3)
    right Jacobian of the bias-correction exp that the reference
    linearizes away); validated against jacfwd in
    ``tests/test_preintegration.py``."""
    dtype = state0.p.dtype
    iewn = params.iewn.astype(dtype)
    gravity = params.gravity.astype(dtype)
    W = rot.skew(iewn)
    T = preint.dt
    eye3 = jnp.eye(3, dtype=dtype)

    dbg = state0.bg - preint.bg_ref
    dba = state0.ba - preint.ba_ref
    Jp_bg = preint.jac[0:3, 9:12]
    Jp_ba = preint.jac[0:3, 12:15]
    Jv_bg = preint.jac[3:6, 9:12]
    Jv_ba = preint.jac[3:6, 12:15]
    Jq_bg = preint.jac[6:9, 9:12]

    corrected_p = preint.dp + Jp_bg @ dbg + Jp_ba @ dba
    corrected_v = preint.dv + Jv_bg @ dbg + Jv_ba @ dba
    phi_bg = Jq_bg @ dbg
    corrected_q = rot.quat_mul(preint.dq, rot.rotvec_to_quat(phi_bg))

    p_cor = 2.0 * W @ (preint.sum_dt_pn - T * state0.p)
    v_cor = 2.0 * W @ (state1.p - state0.p)
    qnn = rot.rotvec_to_quat(-iewn * T)

    dpn = state1.p - state0.p - state0.v * T - 0.5 * gravity * T * T + p_cor
    dvn = state1.v - state0.v - gravity * T + v_cor

    C0 = rot.quat_to_matrix(rot.quat_inv(state0.q))
    A = rot.quat_mul(rot.quat_inv(state1.q), rot.quat_mul(qnn, state0.q))
    M = rot.quat_mul(A, corrected_q)

    r = jnp.concatenate([
        C0 @ dpn - corrected_p,
        C0 @ dvn - corrected_v,
        2.0 * M[1:],
        state1.bg - state0.bg,
        state1.ba - state0.ba,
    ])

    LA_RB = (rot.quat_left(A) @ rot.quat_right(corrected_q))[1:, 1:]
    LM = rot.quat_left(M)[1:, 1:]
    RM = rot.quat_right(M)[1:, 1:]
    Jr = _so3_right_jacobian(phi_bg)

    J = jnp.zeros((15, 30), dtype)
    # r_p rows
    J = J.at[0:3, 0:3].set(-C0 - 2.0 * T * (C0 @ W))
    J = J.at[0:3, 3:6].set(rot.skew(C0 @ dpn))
    J = J.at[0:3, 6:9].set(-T * C0)
    J = J.at[0:3, 9:12].set(-Jp_bg)
    J = J.at[0:3, 12:15].set(-Jp_ba)
    J = J.at[0:3, 15:18].set(C0)
    # r_v rows
    J = J.at[3:6, 0:3].set(-2.0 * (C0 @ W))
    J = J.at[3:6, 3:6].set(rot.skew(C0 @ dvn))
    J = J.at[3:6, 6:9].set(-C0)
    J = J.at[3:6, 9:12].set(-Jv_bg)
    J = J.at[3:6, 12:15].set(-Jv_ba)
    J = J.at[3:6, 15:18].set(2.0 * (C0 @ W))
    J = J.at[3:6, 21:24].set(C0)
    # r_q rows
    J = J.at[6:9, 3:6].set(LA_RB)
    J = J.at[6:9, 9:12].set(LM @ Jr @ Jq_bg)
    J = J.at[6:9, 18:21].set(-RM)
    # bias rows
    J = J.at[9:12, 9:12].set(-eye3)
    J = J.at[9:12, 24:27].set(eye3)
    J = J.at[12:15, 12:15].set(-eye3)
    J = J.at[12:15, 27:30].set(eye3)
    return r, J
