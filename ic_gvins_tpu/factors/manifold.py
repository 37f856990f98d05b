"""Error-state manifold for the sliding-window problem.

Parity with the reference pose parameterization
(``factors/pose_parameterization.h:34-57``): pose delta is applied as
``p += dp``, ``q = q ⊗ exp(dtheta)`` (right-multiplicative), and mix
(velocity/biases) deltas are additive.

Per-node local error ordering (15):
``[dp 0:3, dtheta 3:6, dv 6:9, dbg 9:12, dba 12:15]`` — pose block first,
matching the reference's [pose(6) | mix(9)] split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import rotation as rot
from ..data.types import NavState

NODE_DOF = 15
POSE_DOF = 6
EXT_DOF = 7  # extrinsic 6 + time delay 1


def pose_boxplus(p: jax.Array, q: jax.Array, delta6: jax.Array):
    """Apply a 6-dof pose delta."""
    return p + delta6[..., 0:3], rot.quat_normalize(
        rot.quat_mul(q, rot.rotvec_to_quat(delta6[..., 3:6]))
    )


def pose_boxminus(p: jax.Array, q: jax.Array, p0: jax.Array, q0: jax.Array):
    """Local coordinates of (p, q) around (p0, q0): inverse of boxplus.

    dtheta = log(q0^-1 ⊗ q) — matches the marginalization prior's manifold
    residual (``factors/marginalization_factor.h:54-110``).
    """
    dp = p - p0
    dq = rot.quat_mul(rot.quat_inv(q0), q)
    return jnp.concatenate([dp, rot.quat_to_rotvec(dq)], axis=-1)


def node_boxplus(state: NavState, delta: jax.Array) -> NavState:
    """Apply a 15-dof node delta (works batched)."""
    p, q = pose_boxplus(state.p, state.q, delta[..., 0:6])
    return state._replace(
        p=p,
        q=q,
        v=state.v + delta[..., 6:9],
        bg=state.bg + delta[..., 9:12],
        ba=state.ba + delta[..., 12:15],
    )


def node_boxminus(state: NavState, ref: NavState) -> jax.Array:
    """15-dof local coordinates of ``state`` around ``ref`` (works batched)."""
    dpose = pose_boxminus(state.p, state.q, ref.p, ref.q)
    return jnp.concatenate(
        [dpose, state.v - ref.v, state.bg - ref.bg, state.ba - ref.ba], axis=-1
    )
