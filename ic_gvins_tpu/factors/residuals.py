"""Factor residuals as pure, vmappable functions (whitened).

Each residual matches the corresponding reference cost function:

* GNSS position factor   — ``factors/gnss_factor.h:52-95``
* reprojection factor    — ``factors/reprojection_factor.h:61-99``
* pose prior             — ``preintegration/imu_pose_prior_factor.h:42-68``
* mix prior              — ``preintegration/imu_mix_prior_factor.h:40-75``
* IMU bias soft prior    — ``preintegration/imu_error_factor.h:45-91``
* Huber robust weight    — Ceres HuberLoss(1.0) as used at
                            ``ic_gvins.cc:1833,1977``

Jacobians are obtained with ``jax.jacfwd`` on the error-state manifold
(see ``manifold.py``) — exact, and consistent with the residual by
construction; the reference's hand-derived analytic Jacobians serve as the
oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import rotation as rot


def gnss_residual(p, q, antlever, gnss_p, gnss_std):
    """3-dim whitened GNSS residual: (p + R(q) lever - p_gnss) / std."""
    r = p + rot.quat_rotate(q, antlever) - gnss_p
    return r / gnss_std


def reprojection_residual(
    p0, q0,  # reference keyframe pose (body->nav)
    p1, q1,  # observing keyframe pose
    tic, qic,  # camera extrinsic: Pb = qic * Pc + tic
    invdepth,
    td,
    uv0, uv1,  # normalized-plane observations in ref/obs frames (2,)
    vel0, vel1,  # normalized-plane velocities (2,)
    td0, td1,  # per-frame time-delay bases
    std,  # reprojection std in normalized coordinates (pixel_std / focal)
):
    """2-dim whitened reprojection residual with time-delay compensation.

    Chain: ref normalized point / invdepth -> ref camera -> body -> world ->
    obs body -> obs camera -> normalized plane, minus the (td-shifted)
    observation. Matches ``reprojection_factor.h:84-99``.
    """
    pts0 = jnp.concatenate([uv0 - (td - td0) * vel0, jnp.ones_like(uv0[:1])])
    pts1 = jnp.concatenate([uv1 - (td - td1) * vel1, jnp.ones_like(uv1[:1])])

    pc0 = pts0 / invdepth
    pb0 = rot.quat_rotate(qic, pc0) + tic
    pw = rot.quat_rotate(q0, pb0) + p0
    pb1 = rot.quat_rotate(rot.quat_inv(q1), pw - p1)
    pc1 = rot.quat_rotate(rot.quat_inv(qic), pb1 - tic)

    r = pc1[:2] / pc1[2] - pts1[:2]
    return r / std


def reprojection_residual_jac(
    p0, q0, p1, q1, tic, qic, invdepth, td,
    uv0, uv1, vel0, vel1, td0, td1, std,
):
    """Whitened reprojection residual + ANALYTIC 2x20 Jacobian w.r.t. the
    boxplus deltas [ref pose 6 | obs pose 6 | ext 6 | td 1 | invdepth 1]
    (right-multiplicative attitude) — the reference's closed-form factor
    Jacobians (``reprojection_factor.h:102-158``) rederived for this
    manifold, replacing a 20-tangent jacfwd per observation per LM
    iteration. Validated against jacfwd in tests/test_solver.py."""
    pts0 = jnp.concatenate([uv0 - (td - td0) * vel0, jnp.ones_like(uv0[:1])])
    pts1 = jnp.concatenate([uv1 - (td - td1) * vel1, jnp.ones_like(uv1[:1])])

    pc0 = pts0 / invdepth
    pb0 = rot.quat_rotate(qic, pc0) + tic
    pw = rot.quat_rotate(q0, pb0) + p0
    pb1 = rot.quat_rotate(rot.quat_inv(q1), pw - p1)
    pc1 = rot.quat_rotate(rot.quat_inv(qic), pb1 - tic)

    x, y, z = pc1[0], pc1[1], pc1[2]
    r = jnp.stack([x / z, y / z]) - pts1[:2]

    Ric = rot.quat_to_matrix(qic)
    R0 = rot.quat_to_matrix(q0)
    R1t = rot.quat_to_matrix(q1).T
    Rcw1 = Ric.T @ R1t          # world -> obs camera
    B = Rcw1 @ R0               # ref body -> obs camera
    M = B @ Ric                 # ref camera -> obs camera

    iz = 1.0 / z
    P = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], pc1.dtype) * iz \
        - jnp.stack([x, y])[:, None] * (iz * iz) \
        * jnp.array([[0.0, 0.0, 1.0]], pc1.dtype)

    PR = P @ Rcw1
    dtd = -(P @ (M @ jnp.concatenate(
        [vel0, jnp.zeros_like(vel0[:1])]) / invdepth)) + vel1
    J = jnp.concatenate([
        PR,                                   # d p0
        -(P @ B) @ rot.skew(pb0),             # d theta0
        -PR,                                  # d p1
        (P @ Ric.T) @ rot.skew(pb1),          # d theta1
        P @ (B - Ric.T),                      # d tic
        P @ (rot.skew(pc1) - M @ rot.skew(pc0)),  # d theta_ic
        dtd[:, None],                         # d td
        (-(P @ (M @ pc0)) / invdepth)[:, None],   # d invdepth
    ], axis=1)
    return r / std, J / std


def pose_prior_residual(p, q, prior_p, prior_q, prior_std6):
    """6-dim whitened pose prior (position + attitude rotvec)."""
    dq = rot.quat_mul(rot.quat_inv(prior_q), q)
    r = jnp.concatenate([p - prior_p, rot.quat_to_rotvec(dq)])
    return r / prior_std6


def mix_prior_residual(v, bg, ba, prior_v, prior_bg, prior_ba, prior_std9):
    """9-dim whitened velocity/bias prior."""
    r = jnp.concatenate([v - prior_v, bg - prior_bg, ba - prior_ba])
    return r / prior_std9


def bias_soft_residual(bg, ba, bg_std, ba_std):
    """6-dim soft zero-prior on the newest node's biases
    (``imu_error_factor.h``: sigma_bg = 7200 deg/hr, sigma_ba = 20000 mGal)."""
    return jnp.concatenate([bg / bg_std, ba / ba_std])


def huber_weight(chi2, delta=1.0):
    """IRLS weight for Ceres HuberLoss(delta): rho'(s).

    rho(s) = s for s <= delta^2 else 2*delta*sqrt(s) - delta^2;
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-30)
    return jnp.minimum(1.0, delta / jnp.sqrt(s))
