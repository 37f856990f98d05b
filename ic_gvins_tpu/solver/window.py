"""Fixed-shape sliding-window problem state.

This replaces the reference's pointer-graph window
(``ic_gvins.h:145-149``: deques of states/preintegrations/GNSS/time nodes +
the Frame/MapPoint/Feature shared_ptr web of ``tracking/``) with SoA arrays
and validity masks: removal/culling are mask updates, window sliding is a
roll + mask reset — so a whole optimization round is one jitted XLA program
with static shapes.

Layout of the error-state vector (dimension ``dim_total``):

    [ node 0 (15) | … | node N-1 (15) | ext (6) | td (1) | sodo (1) | landmarks (L) ]

per node: [dp 0:3, dtheta 3:6, dv 6:9, dbg 9:12, dba 12:15].

``sodo`` is the odometer scale factor. The reference carries it per mix
block (mix=10, ``preintegration.h:106-118``) linked by the preintegration's
random-walk rows; over a ~10-keyframe window the scale drift is far below
its observability, so here it is a single window-global state (frozen and
information-free when the ODO mode is off).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.types import NavState
from ..ins.preintegration import PreintData

NODE_DOF = 15
EXT_DOF = 8  # 6 extrinsic + 1 time delay + 1 odometer scale
EXTTD_DOF = 7  # the part reprojection factors touch (ext + td)


class Window(NamedTuple):
    """Sliding-window estimate. N nodes, L landmarks, all masked."""

    nodes: NavState  # batched [N]
    node_valid: jax.Array  # [N] bool
    node_is_kf: jax.Array  # [N] bool — reprojection only links keyframes
    preint: PreintData  # batched [N-1]; interval i joins node i -> i+1
    preint_valid: jax.Array  # [N-1] bool
    gnss_p: jax.Array  # [N,3] local-frame GNSS fix at node time
    gnss_std: jax.Array  # [N,3] effective std (chi2-reweighted per round)
    gnss_std_base: jax.Array  # [N,3] as-ingested std (reweight baseline)
    gnss_valid: jax.Array  # [N] bool
    ext_p: jax.Array  # (3,) camera-IMU translation t_b_c
    ext_q: jax.Array  # (4,) camera-IMU rotation q_b_c
    td: jax.Array  # () camera-IMU time delay
    sodo: jax.Array  # () odometer scale factor (ODO modes; else frozen)
    frame_td: jax.Array  # [N] per-frame time-delay base (td0/td1)
    lm_invdepth: jax.Array  # [L]
    lm_ref: jax.Array  # [L] int32 anchor node index
    lm_valid: jax.Array  # [L] bool
    obs_uv: jax.Array  # [L,N,2] normalized-plane observation
    obs_vel: jax.Array  # [L,N,2] normalized-plane velocity
    obs_valid: jax.Array  # [L,N] bool

    @property
    def n_nodes(self) -> int:
        return self.node_valid.shape[0]

    @property
    def n_landmarks(self) -> int:
        return self.lm_valid.shape[0]

    @property
    def dim_x(self) -> int:
        """States-only dimension (nodes + extrinsic + td)."""
        return self.n_nodes * NODE_DOF + EXT_DOF

    @property
    def dim_total(self) -> int:
        return self.dim_x + self.n_landmarks


class Prior(NamedTuple):
    """Marginalization prior as a quadratic form over the states-only
    coordinates [nodes | ext | td] (landmarks never survive
    marginalization — parity with ``marginalization_info.h:153-192``):

        cost(x) = const + g . dx + 0.5 dx^T H dx,   dx = x ⊟ lin

    TPU-first deviation from the reference: the reference materializes the
    eigen square root (J0, e0) because Ceres factors must return residual
    VECTORS (``marginalization_info.h:153-167``); this solver consumes only
    the Gauss-Newton pieces J0^T J0 = H and J0^T e0 = g, so the prior is
    carried as (H, g) directly — no per-keyframe dense eigendecomposition
    anywhere in the pipeline (it dominated the TPU round at ~18 ms/seq)."""

    H: jax.Array  # [DX, DX] information (GN Hessian) at lin
    g: jax.Array  # [DX] gradient at lin
    lin_nodes: NavState  # [N] linearization snapshot
    lin_ext_p: jax.Array
    lin_ext_q: jax.Array
    lin_td: jax.Array
    lin_sodo: jax.Array


class SolverConfig(NamedTuple):
    """Traced solver tunables (static shape knobs live in the engine)."""

    antlever: jax.Array  # (3,)
    reproj_std: jax.Array  # () normalized-coordinate reprojection std
    bias_prior_bg_std: jax.Array  # () soft bias prior (7200 deg/hr)
    bias_prior_ba_std: jax.Array  # () soft bias prior (20000 mGal)
    estimate_extrinsic: jax.Array  # () bool
    estimate_td: jax.Array  # () bool
    estimate_sodo: jax.Array  # () bool (ODO modes)
    sodo_prior_std: jax.Array  # () soft zero-prior std (0.02, imu_error_factor.h)
    # chi2 GNSS reweight mode: False (default) = non-compounding capped
    # inflation recomputed from the base std each round; True = the
    # reference's in-place compounding (gnss->std *= scale,
    # ic_gvins.cc:1275-1301). See tests/test_chi2_ab.py for the A/B.
    chi2_compound: jax.Array = None


def empty_window(n_nodes: int, n_landmarks: int, dtype=jnp.float64,
                 odo: bool = False) -> Window:
    """``odo=True`` allocates odometer-augmented preintegration intervals
    (19-dim state, ``ins/preintegration_odo.py``) — a static, per-run mode
    choice like the reference's PreintegrationOptions factory
    (``preintegration.h:37-73``)."""
    N, L = n_nodes, n_landmarks
    nodes = NavState(
        time=jnp.zeros(N, dtype),
        p=jnp.zeros((N, 3), dtype),
        q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N, 1)),
        v=jnp.zeros((N, 3), dtype),
        bg=jnp.zeros((N, 3), dtype),
        ba=jnp.zeros((N, 3), dtype),
    )
    end_state = NavState(
        time=jnp.zeros(N - 1, dtype),
        p=jnp.zeros((N - 1, 3), dtype),
        q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N - 1, 1)),
        v=jnp.zeros((N - 1, 3), dtype),
        bg=jnp.zeros((N - 1, 3), dtype),
        ba=jnp.zeros((N - 1, 3), dtype),
    )
    if odo:
        from ..ins.preintegration_odo import NUM_STATE as ODO_DOF
        from ..ins.preintegration_odo import OdoPreintData

        preint = OdoPreintData(
            dp=jnp.zeros((N - 1, 3), dtype),
            dv=jnp.zeros((N - 1, 3), dtype),
            dq=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N - 1, 1)),
            ds=jnp.zeros((N - 1, 3), dtype),
            jac=jnp.tile(jnp.eye(ODO_DOF, dtype=dtype), (N - 1, 1, 1)),
            cov=jnp.tile(jnp.eye(ODO_DOF, dtype=dtype), (N - 1, 1, 1)),
            dt=jnp.zeros(N - 1, dtype),
            sum_dt_pn=jnp.zeros((N - 1, 3), dtype),
            bg_ref=jnp.zeros((N - 1, 3), dtype),
            ba_ref=jnp.zeros((N - 1, 3), dtype),
            sodo_ref=jnp.zeros(N - 1, dtype),
            end_state=end_state,
        )
    else:
        preint = PreintData(
            dp=jnp.zeros((N - 1, 3), dtype),
            dv=jnp.zeros((N - 1, 3), dtype),
            dq=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N - 1, 1)),
            jac=jnp.tile(jnp.eye(NODE_DOF, dtype=dtype), (N - 1, 1, 1)),
            cov=jnp.tile(jnp.eye(NODE_DOF, dtype=dtype), (N - 1, 1, 1)),
            dt=jnp.zeros(N - 1, dtype),
            sum_dt_pn=jnp.zeros((N - 1, 3), dtype),
            bg_ref=jnp.zeros((N - 1, 3), dtype),
            ba_ref=jnp.zeros((N - 1, 3), dtype),
            end_state=end_state,
        )
    return Window(
        nodes=nodes,
        node_valid=jnp.zeros(N, bool),
        node_is_kf=jnp.zeros(N, bool),
        preint=preint,
        preint_valid=jnp.zeros(N - 1, bool),
        gnss_p=jnp.zeros((N, 3), dtype),
        gnss_std=jnp.ones((N, 3), dtype),
        gnss_std_base=jnp.ones((N, 3), dtype),
        gnss_valid=jnp.zeros(N, bool),
        ext_p=jnp.zeros(3, dtype),
        ext_q=jnp.array([1.0, 0, 0, 0], dtype),
        td=jnp.zeros((), dtype),
        sodo=jnp.zeros((), dtype),
        frame_td=jnp.zeros(N, dtype),
        lm_invdepth=jnp.full(L, 0.1, dtype),
        lm_ref=jnp.zeros(L, jnp.int32),
        lm_valid=jnp.zeros(L, bool),
        obs_uv=jnp.zeros((L, N, 2), dtype),
        obs_vel=jnp.zeros((L, N, 2), dtype),
        obs_valid=jnp.zeros((L, N), bool),
    )


def empty_prior(n_nodes: int, dtype=jnp.float64) -> Prior:
    dx = n_nodes * NODE_DOF + EXT_DOF
    return Prior(
        H=jnp.zeros((dx, dx), dtype),
        g=jnp.zeros(dx, dtype),
        lin_nodes=NavState(
            time=jnp.zeros(n_nodes, dtype),
            p=jnp.zeros((n_nodes, 3), dtype),
            q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (n_nodes, 1)),
            v=jnp.zeros((n_nodes, 3), dtype),
            bg=jnp.zeros((n_nodes, 3), dtype),
            ba=jnp.zeros((n_nodes, 3), dtype),
        ),
        lin_ext_p=jnp.zeros(3, dtype),
        lin_ext_q=jnp.array([1.0, 0, 0, 0], dtype),
        lin_td=jnp.zeros((), dtype),
        lin_sodo=jnp.zeros((), dtype),
    )


def make_init_prior(
    window: Window,
    pose_std6: jax.Array,
    mix_std9: jax.Array,
    ext_std7: jax.Array | None = None,
) -> Prior:
    """Initialization prior on node 0 expressed in the generic prior form
    r = e + J dx with e = 0 and J = diag(1/std) over node-0 dims — exactly
    the reference's pose/mix prior factors (``imu_pose_prior_factor.h``,
    ``imu_mix_prior_factor.h``, constructed at ``ic_gvins.cc:2003-2038``).

    ``ext_std7`` optionally anchors the camera extrinsic + time delay
    around the calibration values (the functional equivalent of the
    reference's extrinsic sanity gate, ic_gvins.cc:1354-1360: without an
    anchor the nearly-unobservable extrinsic translation can run away)."""
    dtype = window.nodes.p.dtype
    dx = window.dim_x
    stds = jnp.concatenate([pose_std6, mix_std9])
    diag = jnp.zeros(dx, dtype).at[:NODE_DOF].set(1.0 / stds)
    if ext_std7 is not None:
        ext_std = jnp.asarray(ext_std7, dtype)
        if ext_std.shape[0] == EXTTD_DOF:  # no sodo entry: leave it free
            ext_std = jnp.concatenate([ext_std, jnp.asarray([1e6], dtype)])
        n15 = window.n_nodes * NODE_DOF
        diag = diag.at[n15 : n15 + EXT_DOF].set(1.0 / ext_std)
    return Prior(
        H=jnp.diag(diag**2),
        g=jnp.zeros(dx, dtype),
        lin_nodes=window.nodes,
        lin_ext_p=window.ext_p,
        lin_ext_q=window.ext_q,
        lin_td=window.td,
        lin_sodo=window.sodo,
    )


def apply_delta(window: Window, dx: jax.Array) -> Window:
    """Apply a full error-state delta to the window estimate."""
    from ..factors.manifold import node_boxplus, pose_boxplus

    N, L = window.n_nodes, window.n_landmarks
    node_dx = dx[: N * NODE_DOF].reshape(N, NODE_DOF)
    nodes = node_boxplus(window.nodes, node_dx)
    ext_dx = dx[N * NODE_DOF : N * NODE_DOF + 6]
    ext_p, ext_q = pose_boxplus(window.ext_p, window.ext_q, ext_dx)
    td = window.td + dx[N * NODE_DOF + 6]
    sodo = window.sodo + dx[N * NODE_DOF + 7]
    invd = window.lm_invdepth + dx[N * NODE_DOF + EXT_DOF :]
    return window._replace(
        nodes=nodes, ext_p=ext_p, ext_q=ext_q, td=td, sodo=sodo,
        lm_invdepth=invd
    )


def state_boxminus(window: Window, prior: Prior) -> jax.Array:
    """States-only local coordinates of the window around the prior's
    linearization point (for the marginalization prior residual)."""
    from ..factors.manifold import node_boxminus, pose_boxminus

    node_dx = node_boxminus(window.nodes, prior.lin_nodes)  # [N,15]
    ext_dx = pose_boxminus(window.ext_p, window.ext_q, prior.lin_ext_p, prior.lin_ext_q)
    td_dx = (window.td - prior.lin_td)[None]
    sodo_dx = (window.sodo - prior.lin_sodo)[None]
    return jnp.concatenate([node_dx.reshape(-1), ext_dx, td_dx, sodo_dx])
