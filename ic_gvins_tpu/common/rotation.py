"""Batched rotation math on SO(3) / quaternions, written for JAX/XLA.

Capability parity with the reference rotation utilities
(``ic_gvins/common/rotation.h:35-119``): quaternion <-> DCM <-> ZYX Euler
conversions, rotation-vector exp/log, skew matrices, and quaternion
left/right product matrices.  Everything here is a pure function over the
trailing axes so it composes with ``jax.vmap`` / ``jax.lax.scan`` and traces
into a single XLA program; no host control flow.

Quaternion convention: Hamilton, scalar-first ``[w, x, y, z]``, body-to-nav
(``q_nb`` rotates body-frame vectors into the nav frame), matching Eigen's
``Quaterniond`` semantics used by the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle guard for exp/log maps. Below this rotation angle we switch to
# the 2nd-order Taylor series (both branches are always evaluated under XLA,
# so the series also protects against NaN gradients at exactly zero).
_SMALL_ANGLE = 1e-8


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]x such that [v]x @ u = v x u. (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def quat_identity(dtype=jnp.float64) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ p, scalar-first, broadcasting over leading axes."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse for unit quaternions (= conjugate)."""
    return quat_conj(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v, without forming R.

    Uses the classic 15-mul expansion: v + 2*w*(u x v) + 2*u x (u x v).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix (DCM), (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion, branch-free (Shepperd's method).

    All four candidate solutions are computed and the best-conditioned one is
    selected with ``jnp.where`` so the function is vmappable and jittable.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (>= 0).
    qw0 = 1.0 + tr
    c0 = jnp.stack([qw0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx1 = 1.0 + m00 - m11 - m22
    c1 = jnp.stack([m21 - m12, qx1, m01 + m10, m02 + m20], axis=-1)
    qy2 = 1.0 - m00 + m11 - m22
    c2 = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    qz3 = 1.0 - m00 - m11 + m22
    c3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz3], axis=-1)

    diag = jnp.stack([qw0, qx1, qy2, qz3], axis=-1)  # (..., 4)
    best = jnp.argmax(diag, axis=-1)

    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    return quat_normalize(q)


def rotvec_to_quat(rv: jax.Array) -> jax.Array:
    """SO(3) exponential map: rotation vector -> quaternion.

    Matches the reference exp map (``rotation.h:72-76``) with a Taylor guard.
    """
    # Guard with the squared norm so gradients stay finite at rv == 0
    # (norm itself has a NaN gradient at zero that would leak through where).
    sq = jnp.sum(rv * rv, axis=-1, keepdims=True)
    small = sq < _SMALL_ANGLE**2
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    angle = jnp.sqrt(safe_sq)
    # sin(angle/2)/angle -> 1/2 - angle^2/48 ;  cos(angle/2) -> 1 - angle^2/8
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(0.5 * angle) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(0.5 * angle))
    return jnp.concatenate([w, k * rv], axis=-1)


def quat_to_rotvec(q: jax.Array) -> jax.Array:
    """SO(3) log map: unit quaternion -> rotation vector (angle * axis)."""
    # Make scalar part non-negative for the principal rotation.
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < _SMALL_ANGLE
    safe_vn = jnp.where(small, jnp.ones_like(vn), vn)
    scale = jnp.where(small, 2.0 / jnp.clip(w, _SMALL_ANGLE, None), angle / safe_vn)
    return scale[..., None] * q[..., 1:]


def rotvec_to_matrix(rv: jax.Array) -> jax.Array:
    return quat_to_matrix(rotvec_to_quat(rv))


def matrix_to_rotvec(m: jax.Array) -> jax.Array:
    return quat_to_rotvec(matrix_to_quat(m))


def matrix_to_euler(m: jax.Array) -> jax.Array:
    """DCM (body->nav, front-right-down) -> [roll, pitch, yaw], ZYX order.

    Yaw (heading) is wrapped to [0, 2*pi) to match the reference convention
    (``rotation.h:44-66``). Gimbal-lock branches are selected with where().
    """
    pitch = jnp.arctan2(-m[..., 2, 0], jnp.sqrt(m[..., 2, 1] ** 2 + m[..., 2, 2] ** 2))
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    yaw_normal = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    yaw_lock_lo = jnp.arctan2(m[..., 1, 2] - m[..., 0, 1], m[..., 0, 2] + m[..., 1, 1])
    yaw_lock_hi = jnp.pi + jnp.arctan2(m[..., 1, 2] + m[..., 0, 1], m[..., 0, 2] - m[..., 1, 1])
    yaw = jnp.where(m[..., 2, 0] <= -0.999, yaw_lock_lo, jnp.where(m[..., 2, 0] >= 0.999, yaw_lock_hi, yaw_normal))
    yaw = jnp.where(yaw < 0, 2.0 * jnp.pi + yaw, yaw)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_matrix(euler: jax.Array) -> jax.Array:
    """[roll, pitch, yaw] -> DCM body->nav (ZYX composition Rz @ Ry @ Rx)."""
    r, p, y = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def euler_to_quat(euler: jax.Array) -> jax.Array:
    return matrix_to_quat(euler_to_matrix(euler))


def quat_to_euler(q: jax.Array) -> jax.Array:
    return matrix_to_euler(quat_to_matrix(q))


def quat_left(q: jax.Array) -> jax.Array:
    """Left-product matrix L(q) such that L(q) @ p = q ⊗ p. (..., 4, 4)."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)
    bottom = jnp.concatenate([v[..., :, None], bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(p: jax.Array) -> jax.Array:
    """Right-product matrix R(p) such that R(p) @ q = q ⊗ p. (..., 4, 4)."""
    w = p[..., 0]
    v = p[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)
    bottom = jnp.concatenate([v[..., :, None], bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
