"""Keyframe-block-sharded long-window bundle adjustment.

SURVEY §5.7's second scaling axis (the sliding window shards landmarks,
``parallel/lm_sharded.py``; long multi-sequence / global BA must shard the
NODE dimension itself): the state system after landmark elimination is
block-banded — block-tridiagonal from the preintegration chain
(`preintegration_factor.h` links node i <-> i+1), diagonal from GNSS
(`gnss_factor.h`), plus short-range node coupling from landmarks observed
over a few consecutive keyframes. A replicated dense solve is O((N*15)^3)
and stops scaling at a few hundred nodes; here the solve itself is
distributed by one level of nested dissection over the device mesh:

* the node axis is cut into S contiguous chunks (device = chunk); the
  last ``sep_width`` (=B) nodes of each chunk form a SEPARATOR BAND,
  everything else chunk-interior,
* each shard eliminates its landmarks (diagonal divide, exactly as the
  sliding-window solver) and assembles its local state system over its
  C+B local nodes (previous band + own chunk) — all factor evaluation
  is shard-local,
* each shard Schur-eliminates its interior block (a local dense Cholesky
  of (C-B)*15 dims) onto its two bands,
* the S*B*15-dim separator system is ``psum``-reduced over the mesh and
  solved replicated (small),
* interior and landmark back-substitution stay shard-local.

Per-device factorization work drops from O((N*15)^3) to O((C*15)^3) +
O((S*B*15)^3) with only two small collectives per iteration (the
separator psum) — the TPU-native equivalent of distributed
block-tridiagonal Cholesky with boundary exchange.

Structural contract (counted and reported by the host-side builder):
every factor's node clique must fit inside (one chunk interior) union
(the adjacent separator bands). The preintegration chain satisfies this
for any cut and any B >= 1. A landmark eliminated from the system creates
a clique over every node observing it; a clique crossing a cut is fully
contained once the band is at least as wide as the landmark's forward
observation span — so with ``sep_width >= max span`` NO observation is
dropped (the reference never discards measurements,
``ic_gvins.cc:1516-1644``; VERDICT r4 #7). Observations still outside
the anchor chunk's local node set (span > sep_width, or backward
observations before the previous band) are masked and counted.

The camera extrinsic/td are FROZEN here (global BA runs calibrated — the
sliding-window estimator owns online extrinsic/td refinement).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.types import IntegrationParams, NavState
from ..factors.manifold import node_boxplus, pose_boxplus
from ..factors.residuals import gnss_residual, reprojection_residual
from ..ins.preintegration import PreintData, preint_residual_jac, sqrt_information
from ..solver.assembly import huber_rho, huber_weight

AXIS = "nodes"
NODE_DOF = 15


class NodesBA(NamedTuple):
    """Long-window BA problem, node axis pre-chunked for S shards.

    Shapes: S = shards, C = nodes per chunk (N = S*C), Lp = landmark
    capacity per shard, W = observation stencil width. Leading [S] axes are
    sharded over the mesh; ``nodes`` is replicated (node states are tiny —
    the O(N^3) solve is what shards, not the estimates)."""

    nodes: NavState  # [N] replicated
    node_valid: jax.Array  # [N]
    # preintegration slab per chunk: factor slot f of chunk c is the global
    # interval (cC-1+f, cC+f); slot 0 of chunk 0 is a masked dummy
    preint: PreintData  # [S, C, ...]
    preint_valid: jax.Array  # [S, C]
    gnss_p: jax.Array  # [S, C, 3] fix at the chunk's own nodes
    gnss_std: jax.Array  # [S, C, 3]
    gnss_valid: jax.Array  # [S, C]
    ext_p: jax.Array  # (3,) frozen camera extrinsic
    ext_q: jax.Array  # (4,)
    # landmarks bucketed by anchor chunk; observation node indices are
    # LOCAL to the chunk's node set [cC-B, (c+1)C) i.e. in [0, C+B)
    lm_invdepth: jax.Array  # [S, Lp]
    lm_ref_local: jax.Array  # [S, Lp] local anchor node index
    lm_valid: jax.Array  # [S, Lp]
    obs_node_local: jax.Array  # [S, Lp, W] local observed node index
    obs_uv: jax.Array  # [S, Lp, W, 2]
    obs_ref_uv: jax.Array  # [S, Lp, 2] anchor observation
    obs_valid: jax.Array  # [S, Lp, W]
    reproj_std: jax.Array  # ()

    @property
    def n_shards(self) -> int:
        return self.preint_valid.shape[0]

    @property
    def chunk(self) -> int:
        return self.preint_valid.shape[1]

    @property
    def n_nodes(self) -> int:
        return self.node_valid.shape[0]


def build_nodes_ba(
    nodes: NavState,
    preint: PreintData,
    gnss_p: np.ndarray,
    gnss_std: np.ndarray,
    gnss_valid: np.ndarray,
    lm_invdepth: np.ndarray,
    lm_ref: np.ndarray,
    obs_uv_dense: np.ndarray,  # [L, N, 2]
    obs_valid_dense: np.ndarray,  # [L, N]
    ext_p, ext_q, reproj_std: float,
    n_chunks: int,
    stencil: int = 16,
    sep_width: int = 1,
    dtype=None,
) -> tuple[NodesBA, int]:
    """Host-side problem builder: chunk the node axis, bucket landmarks by
    anchor position, compress dense observations to the local stencil.
    Returns (problem, n_dropped_obs) — observations outside the anchor
    chunk's local node set [cC-B, (c+1)C) are dropped and counted; with
    ``sep_width`` >= the maximum forward observation span the count is 0
    (the band containment argument in the module docstring).

    ``sep_width`` (B) must match the value passed to ``ba_nodes_solve``."""
    N = int(np.asarray(nodes.p).shape[0])
    S = n_chunks
    if N % S != 0:
        raise ValueError(f"n_nodes {N} must divide n_chunks {S}")
    C = N // S
    B = int(sep_width)
    if not (1 <= B < C) and S > 1:
        raise ValueError(f"sep_width {B} must be in [1, chunk {C})")
    L = len(lm_ref)
    dtype = dtype or np.asarray(nodes.p).dtype

    # --- preintegration slabs: chunk c takes intervals [cC-1, (c+1)C-1) ---
    def slab(arr):
        # pad slot duplicates interval 0 (NOT zeros: a zero covariance
        # would NaN through sqrt_information before the mask applies)
        arr = np.asarray(arr)
        ext = np.concatenate([arr[:1], arr])  # global interval j at ext[j+1]
        return np.stack([ext[c * C : (c + 1) * C] for c in range(S)])

    pre_s = jax.tree.map(slab, preint)
    pre_valid = slab(np.ones(N - 1, bool))
    pre_valid[0, 0] = False  # dummy interval (-1, 0)

    # --- GNSS per own chunk ---
    g_p = np.asarray(gnss_p).reshape(S, C, 3)
    g_std = np.asarray(gnss_std).reshape(S, C, 3)
    g_val = np.asarray(gnss_valid).reshape(S, C)

    # --- landmark bucketing by anchor position: a landmark anchored in
    # chunk c's separator band [.. (c+1)C) belongs to chunk c+1 (the band
    # is c+1's PREVIOUS band, so both the anchor and the forward
    # observations land inside c+1's local node set) ---
    anchor_chunk = np.clip((np.asarray(lm_ref) + B) // C, 0, S - 1)
    per_chunk: list[list[int]] = [[] for _ in range(S)]
    for l in range(L):
        per_chunk[int(anchor_chunk[l])].append(l)
    Lp = max(1, max(len(b) for b in per_chunk))
    W = stencil

    lm_inv = np.zeros((S, Lp), dtype)
    lm_refl = np.zeros((S, Lp), np.int32)
    lm_val = np.zeros((S, Lp), bool)
    obs_nl = np.zeros((S, Lp, W), np.int32)
    obs_uv = np.zeros((S, Lp, W, 2), dtype)
    obs_ruv = np.zeros((S, Lp, 2), dtype)
    obs_val = np.zeros((S, Lp, W), bool)
    dropped = 0
    for c in range(S):
        lo, hi = c * C - B, (c + 1) * C  # local node set [lo, hi)
        for slot, l in enumerate(per_chunk[c]):
            a = int(lm_ref[l])
            lm_inv[c, slot] = lm_invdepth[l]
            lm_refl[c, slot] = a - lo
            lm_val[c, slot] = True
            obs_ruv[c, slot] = obs_uv_dense[l, a]
            ks = np.nonzero(obs_valid_dense[l])[0]
            ks = ks[ks != a]
            w = 0
            for k in ks:
                if not (lo <= k < hi):
                    dropped += 1
                    continue
                if w >= W:
                    dropped += 1
                    continue
                obs_nl[c, slot, w] = k - lo
                obs_uv[c, slot, w] = obs_uv_dense[l, k]
                obs_val[c, slot, w] = True
                w += 1

    j = jnp.asarray
    ba = NodesBA(
        nodes=jax.tree.map(j, nodes),
        node_valid=jnp.ones(N, bool),
        preint=jax.tree.map(j, pre_s),
        preint_valid=j(pre_valid),
        gnss_p=j(g_p), gnss_std=j(g_std), gnss_valid=j(g_val),
        ext_p=j(ext_p), ext_q=j(ext_q),
        lm_invdepth=j(lm_inv), lm_ref_local=j(lm_refl), lm_valid=j(lm_val),
        obs_node_local=j(obs_nl), obs_uv=j(obs_uv), obs_ref_uv=j(obs_ruv),
        obs_valid=j(obs_val),
        reproj_std=j(np.asarray(reproj_std, dtype)),
    )
    return ba, dropped


# ---------------------------------------------------------------------------
# Shard-local evaluation (runs inside shard_map; [S] axes already indexed)
# ---------------------------------------------------------------------------


class _Shard(NamedTuple):
    """One chunk's slice of NodesBA plus its local node states [C+B]."""

    loc_nodes: NavState  # [C+B] local node set (prev band + chunk)
    loc_valid: jax.Array  # [C+B]
    preint: PreintData  # [C]
    preint_valid: jax.Array
    gnss_p: jax.Array
    gnss_std: jax.Array
    gnss_valid: jax.Array
    ext_p: jax.Array
    ext_q: jax.Array
    lm_invdepth: jax.Array
    lm_ref_local: jax.Array
    lm_valid: jax.Array
    obs_node_local: jax.Array
    obs_uv: jax.Array
    obs_ref_uv: jax.Array
    obs_valid: jax.Array
    reproj_std: jax.Array


def _take_local(ba_nodes: NavState, node_valid, c, C, B):
    """Local node set [cC-B, (c+1)C) with dummies at locals 0..B-1 for
    c=0."""
    start = jnp.maximum(c * C - B, 0)
    # pad B duplicate rows so the C+B slice fits when C == N (single
    # chunk); the pad is only reachable in that case, where the c == 0
    # shift below immediately pushes it out again
    padB = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], B, 0)], 0)
    loc = jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(padB(x), start, C + B, 0),
        ba_nodes,
    )
    val = jax.lax.dynamic_slice_in_dim(padB(node_valid), start, C + B, 0)
    # c == 0: slice starts at 0 (no previous band) -> shift down by B and
    # invalidate locals 0..B-1. The dummy rows duplicate the first real
    # node (NOT zeros: a zero quaternion NaNs the factor math before
    # masking).
    def shift(x):
        return jnp.concatenate([jnp.repeat(x[:1], B, 0), x[:-B]], 0)

    loc0 = jax.tree.map(shift, loc)
    val0 = shift(val).at[:B].set(False)
    is0 = c == 0
    loc = jax.tree.map(lambda a, b: jnp.where(is0, a, b), loc0, loc)
    val = jnp.where(is0, val0, val)
    return loc, val


def _node_i(nodes: NavState, i) -> NavState:
    return jax.tree.map(lambda x: x[i], nodes)


def _eval_local(sh: _Shard, params: IntegrationParams):
    """Assemble the shard-local damped-ready system:

    returns (H_loc [(C+B)*15, (C+B)*15], g_loc, Hxl [(C+B)*15, Lp],
    hll [Lp], gl [Lp], cost_local). Landmarks NOT yet eliminated.

    B (the separator band width) is inferred from the shapes: the local
    node set has C+B nodes while the preintegration slab has C factors."""
    n_loc = sh.loc_valid.shape[0]
    C = sh.preint_valid.shape[0]
    B = n_loc - C
    dtype = sh.loc_nodes.p.dtype
    D = n_loc * NODE_DOF

    Hnn = jnp.zeros((n_loc, NODE_DOF, n_loc, NODE_DOF), dtype)
    g_n = jnp.zeros((n_loc, NODE_DOF), dtype)

    # --- preintegration chain: factor f is the global interval
    # (cC-1+f, cC+f), i.e. local nodes (B-1+f, B+f) ---
    def pre_one(f):
        pre = jax.tree.map(lambda x: x[f], sh.preint)
        return preint_residual_jac(
            pre, _node_i(sh.loc_nodes, B - 1 + f),
            _node_i(sh.loc_nodes, B + f), params
        )

    r_pre, J_pre = jax.vmap(pre_one)(jnp.arange(C))
    Sq = sqrt_information(sh.preint.cov)
    r_pre = jnp.einsum("fij,fj->fi", Sq, r_pre)
    J_pre = jnp.einsum("fij,fjc->fic", Sq, J_pre)
    m_pre = (
        sh.preint_valid
        & sh.loc_valid[B - 1:B - 1 + C]
        & sh.loc_valid[B:]
    ).astype(dtype)
    r_pre = r_pre * m_pre[:, None]
    J_pre = J_pre * m_pre[:, None, None]
    Ji = J_pre[..., :NODE_DOF]
    Jj = J_pre[..., NODE_DOF:]
    Pi = jnp.eye(n_loc, dtype=dtype)[B - 1:B - 1 + C]
    Pj = jnp.eye(n_loc, dtype=dtype)[B:]
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pi, Pi,
                           jnp.einsum("frc,frd->fcd", Ji, Ji))
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pj, Pj,
                           jnp.einsum("frc,frd->fcd", Jj, Jj))
    Aij = jnp.einsum("frc,frd->fcd", Ji, Jj)
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pi, Pj, Aij)
    Hnn = Hnn + jnp.einsum("fa,fb,fdc->acbd", Pj, Pi, Aij)
    g_n = g_n + jnp.einsum("fa,frc,fr->ac", Pi, Ji, r_pre)
    g_n = g_n + jnp.einsum("fa,frc,fr->ac", Pj, Jj, r_pre)
    cost = 0.5 * jnp.sum(r_pre**2)

    # --- GNSS on own-chunk nodes (local indices B..B+C-1) ---
    def g_one(k):
        node = _node_i(sh.loc_nodes, k + B)

        def res(d6):
            p, q = pose_boxplus(node.p, node.q, d6)
            return gnss_residual(p, q, jnp.zeros(3, dtype), sh.gnss_p[k],
                                 jnp.maximum(sh.gnss_std[k], 1e-6))

        z = jnp.zeros(6, dtype)
        return res(z), jax.jacfwd(res)(z)

    r_g, J_g = jax.vmap(g_one)(jnp.arange(C))
    m_g = (sh.gnss_valid & sh.loc_valid[B:]).astype(dtype)
    r_g = r_g * m_g[:, None]
    J_g = J_g * m_g[:, None, None]
    chi_g = jnp.sum(r_g**2, -1)
    w_g = huber_weight(chi_g)
    A_g = w_g[:, None, None] * jnp.einsum("frc,frd->fcd", J_g, J_g)
    Hnn = Hnn.at[B:, 0:6, B:, 0:6].add(
        jnp.einsum("ka,kb,kcd->acbd", jnp.eye(C, dtype=dtype),
                   jnp.eye(C, dtype=dtype), A_g))
    g_n = g_n.at[B:, 0:6].add(w_g[:, None] * jnp.einsum("frc,fr->fc", J_g, r_g))
    cost = cost + 0.5 * jnp.sum(huber_rho(chi_g) * (chi_g > 0))

    # --- reprojection factors over the local stencil ---
    Lp, W = sh.obs_valid.shape

    def rp_one(l, w):
        ref = sh.lm_ref_local[l]
        obs = sh.obs_node_local[l, w]
        nref = _node_i(sh.loc_nodes, ref)
        nobs = _node_i(sh.loc_nodes, obs)

        def res(d13):
            p0, q0 = pose_boxplus(nref.p, nref.q, d13[0:6])
            p1, q1 = pose_boxplus(nobs.p, nobs.q, d13[6:12])
            invd = sh.lm_invdepth[l] + d13[12]
            invd = jnp.where(jnp.abs(invd) < 1e-4, 1e-4, invd)
            z2 = jnp.zeros(2, dtype)
            z0 = jnp.zeros((), dtype)
            return reprojection_residual(
                p0, q0, p1, q1, sh.ext_p, sh.ext_q, invd, z0,
                sh.obs_ref_uv[l], sh.obs_uv[l, w], z2, z2, z0, z0,
                sh.reproj_std,
            )

        z = jnp.zeros(13, dtype)
        return res(z), jax.jacfwd(res)(z)

    r_v, J_v = jax.vmap(
        jax.vmap(rp_one, in_axes=(None, 0)), in_axes=(0, None)
    )(jnp.arange(Lp), jnp.arange(W))  # [Lp,W,2], [Lp,W,2,13]
    m_v = (
        sh.obs_valid
        & sh.lm_valid[:, None]
        & sh.loc_valid[sh.lm_ref_local][:, None]
        & sh.loc_valid[sh.obs_node_local]
        & (sh.obs_node_local != sh.lm_ref_local[:, None])
    ).astype(dtype)
    r_v = r_v * m_v[..., None]
    J_v = J_v * m_v[..., None, None]
    chi_v = jnp.sum(r_v**2, -1)
    w_v = huber_weight(chi_v)
    Jr = J_v[..., 0:6]
    Jo = J_v[..., 6:12]
    Jl = J_v[..., 12]
    wJr = w_v[..., None, None] * Jr
    wJo = w_v[..., None, None] * Jo
    wJl = w_v[..., None] * Jl
    Oref = (sh.lm_ref_local[:, None] == jnp.arange(n_loc)[None, :]).astype(dtype)
    Oobs = (
        sh.obs_node_local[:, :, None] == jnp.arange(n_loc)[None, None, :]
    ).astype(dtype)  # [Lp,W,n_loc]

    H_oo = jnp.einsum("lwa,lwb,lwrc,lwrd->acbd", Oobs, Oobs, wJo, Jo)
    H_rr = jnp.einsum("la,lb,lwrc,lwrd->acbd", Oref, Oref, wJr, Jr)
    H_ro = jnp.einsum("la,lwb,lwrc,lwrd->acbd", Oref, Oobs, wJr, Jo)
    Hnn = Hnn.at[:, 0:6, :, 0:6].add(
        H_oo + H_rr + H_ro + H_ro.transpose(2, 3, 0, 1)
    )
    g_n = g_n.at[:, 0:6].add(
        jnp.einsum("lwa,lwrc,lwr->ac", Oobs, wJo, r_v)
        + jnp.einsum("la,lwrc,lwr->ac", Oref, wJr, r_v)
    )
    hll = jnp.einsum("lwr,lwr->l", wJl, Jl)
    H_ln = jnp.einsum("lwr,lwrc,lwa->lac", wJl, Jo, Oobs) + jnp.einsum(
        "lwr,lwrc,la->lac", wJl, Jr, Oref
    )  # [Lp, n_loc, 6]
    Hxl = jnp.zeros((n_loc, NODE_DOF, Lp), dtype).at[:, 0:6, :].set(
        H_ln.transpose(1, 2, 0)
    )
    gl = jnp.einsum("lwr,lwr->l", wJl, r_v)
    cost = cost + 0.5 * jnp.sum(huber_rho(chi_v) * (chi_v > 0))

    return (
        Hnn.reshape(D, D), g_n.reshape(D), Hxl.reshape(D, Lp), hll, gl, cost,
    )


def _cost_local(sh: _Shard, params: IntegrationParams):
    """Residual-only local robust cost (trial-point probe)."""
    _, _, _, _, _, cost = _eval_local(sh, params)
    return cost


def _make_shard(ba: NodesBA, c, C, B) -> _Shard:
    loc, val = _take_local(ba.nodes, ba.node_valid, c, C, B)
    return _Shard(
        loc_nodes=loc, loc_valid=val,
        preint=ba.preint, preint_valid=ba.preint_valid,
        gnss_p=ba.gnss_p, gnss_std=ba.gnss_std, gnss_valid=ba.gnss_valid,
        ext_p=ba.ext_p, ext_q=ba.ext_q,
        lm_invdepth=ba.lm_invdepth, lm_ref_local=ba.lm_ref_local,
        lm_valid=ba.lm_valid, obs_node_local=ba.obs_node_local,
        obs_uv=ba.obs_uv, obs_ref_uv=ba.obs_ref_uv, obs_valid=ba.obs_valid,
        reproj_std=ba.reproj_std,
    )


def _shard_spec(ba: NodesBA) -> NodesBA:
    """PartitionSpec pytree: [S]-leading arrays sharded, rest replicated."""
    sh = P(AXIS)
    return NodesBA(
        nodes=jax.tree.map(lambda _: P(), ba.nodes),
        node_valid=P(),
        preint=jax.tree.map(lambda _: sh, ba.preint),
        preint_valid=sh,
        gnss_p=sh, gnss_std=sh, gnss_valid=sh,
        ext_p=P(), ext_q=P(),
        lm_invdepth=sh, lm_ref_local=sh, lm_valid=sh,
        obs_node_local=sh, obs_uv=sh, obs_ref_uv=sh, obs_valid=sh,
        reproj_std=P(),
    )


@partial(jax.jit, static_argnames=("mesh", "iters", "sep_width"))
def ba_nodes_solve(
    ba: NodesBA,
    params: IntegrationParams,
    mesh: Mesh,
    iters: int = 10,
    lam0: float = 1e-4,
    sep_width: int = 1,
):
    """Damped Gauss-Newton (LM accept/reject) over the node-sharded
    problem. Returns (ba_updated, stats dict of (cost0, cost1, accepted)).
    ``sep_width`` must match the value the problem was built with.

    Control flow (damping, accept/reject) is replicated — every device
    sees the same psum-reduced costs, so the loops stay in lockstep."""
    S = ba.n_shards
    C = ba.chunk
    N = ba.n_nodes
    B = int(sep_width)
    dtype = ba.nodes.p.dtype
    BD = B * NODE_DOF  # one separator band's dims
    DL = (C + B) * NODE_DOF
    DI = (C - B) * NODE_DOF  # interior dims (local nodes B..C-1)
    DB = S * BD  # global separator system

    def inner(ba_sh: NodesBA):
        c = jax.lax.axis_index(AXIS)
        squeeze = lambda x: x[0]

        # build the shard view at an evaluation point (nodes replicated,
        # landmark inverse depths shard-local)
        def shard_at(nodes, lm_invd):
            b = NodesBA(
                nodes=nodes,
                node_valid=_nv,
                preint=jax.tree.map(squeeze, ba_sh.preint),
                preint_valid=squeeze(ba_sh.preint_valid),
                gnss_p=squeeze(ba_sh.gnss_p),
                gnss_std=squeeze(ba_sh.gnss_std),
                gnss_valid=squeeze(ba_sh.gnss_valid),
                ext_p=ba_sh.ext_p, ext_q=ba_sh.ext_q,
                lm_invdepth=lm_invd,
                lm_ref_local=squeeze(ba_sh.lm_ref_local),
                lm_valid=squeeze(ba_sh.lm_valid),
                obs_node_local=squeeze(ba_sh.obs_node_local),
                obs_uv=squeeze(ba_sh.obs_uv),
                obs_ref_uv=squeeze(ba_sh.obs_ref_uv),
                obs_valid=squeeze(ba_sh.obs_valid),
                reproj_std=ba_sh.reproj_std,
            )
            return _make_shard(b, c, C, B)

        _nv = ba_sh.node_valid

        # separator bookkeeping: local boundary bands (locals [0,B) and
        # [C, C+B)) map to global bands (c-1, c); c=0's prev band is a
        # dummy (one-hot at -1 is all-zero, so it contributes nothing)
        sep_prev = (jnp.arange(S) == c - 1).astype(dtype)  # one-hot [S]
        sep_own = (jnp.arange(S) == c).astype(dtype)
        OH = jnp.stack([sep_prev, sep_own])  # [2, S]

        def step(nodes, lm_invd, lam):
            sh = shard_at(nodes, lm_invd)
            H, g, Hxl, hll, gl, cost = _eval_local(sh, params)

            # landmark elimination (shard-local diagonal Schur)
            lm_free = (sh.lm_valid & (jnp.sum(
                (sh.obs_valid & (sh.obs_node_local != sh.lm_ref_local[:, None])),
                axis=1) > 0)).astype(dtype)
            hll = jnp.where((hll * lm_free) > 1e-12, hll, 1.0)
            hll_d = hll * (1.0 + lam)
            glf = gl * lm_free
            Hxlf = Hxl * lm_free[None, :]
            H = H - (Hxlf / hll_d[None, :]) @ Hxlf.T
            g = g - Hxlf @ (glf / hll_d)

            # damp + freeze invalid local nodes
            free = jnp.repeat(sh.loc_valid, NODE_DOF).astype(dtype)
            H = H * free[:, None] * free[None, :]
            g = g * free
            dH = jnp.diag(H)
            # unit-regularize empty INTERIOR dims only: a boundary-band
            # dim can be empty locally yet receive contributions from the
            # neighboring shard, so its regularization happens AFTER the
            # psum (on Sg below); a local +1.0 there would bias the
            # reduced separator system
            int_mask = jnp.zeros(DL, dtype).at[
                B * NODE_DOF + jnp.arange(DI)].set(1.0)
            H = H + jnp.diag(
                lam * dH + int_mask * jnp.where(dH < 1e-12, 1.0, 0.0))

            # split interior (local B..C-1) vs boundary bands (locals
            # [0,B) and [C,C+B))
            bsel = jnp.concatenate([
                jnp.arange(BD),
                C * NODE_DOF + jnp.arange(BD),
            ])
            isel = BD + jnp.arange(DI)
            Hii = H[isel[:, None], isel[None, :]]
            Hib = H[isel[:, None], bsel[None, :]]
            Hbb = H[bsel[:, None], bsel[None, :]]
            gi = g[isel]
            gb = g[bsel]

            # interior elimination: local dense Cholesky
            Lc = jnp.linalg.cholesky(Hii)
            HiiInvHib = jax.scipy.linalg.cho_solve((Lc, True), Hib)
            HiiInvGi = jax.scipy.linalg.cho_solve((Lc, True), gi)
            Sbb = Hbb - Hib.T @ HiiInvHib  # [2*BD, 2*BD]
            sb = gb - Hib.T @ HiiInvGi

            # scatter into the global separator system and psum
            # (the [2,S] one-hot embeds this shard's two band slots)
            Sg = jnp.einsum("as,aibj,bt->sitj", OH,
                            Sbb.reshape(2, BD, 2, BD), OH)
            sg = jnp.einsum("as,ai->si", OH, sb.reshape(2, BD))
            Sg, sg = jax.lax.psum((Sg.reshape(DB, DB), sg.reshape(DB)), AXIS)
            # dummy separator dims (nothing contributed): unit diagonal
            dS = jnp.diag(Sg)
            Sg = Sg + jnp.diag(jnp.where(dS < 1e-12, 1.0, 0.0))

            Lb = jnp.linalg.cholesky(Sg)
            dx_b = -jax.scipy.linalg.cho_solve((Lb, True), sg)

            # local back-substitution
            dx_b_loc = jnp.einsum("as,si->ai", OH,
                                  dx_b.reshape(S, BD)).reshape(-1)
            dx_i = -HiiInvGi - HiiInvHib @ dx_b_loc
            dx_loc = jnp.zeros(DL, dtype)
            dx_loc = dx_loc.at[isel].set(dx_i)
            dx_loc = dx_loc.at[bsel].set(dx_b_loc)
            dx_loc = dx_loc * free
            dx_l = -lm_free * (glf + Hxlf.T @ dx_loc) / hll_d

            # assemble the global node delta: interiors owned uniquely by
            # this shard; separator bands replicated (identical everywhere)
            start = jnp.maximum(c * C - B, 0)
            dxm = dx_loc.reshape(C + B, NODE_DOF)
            dxm = jnp.where(
                c == 0,
                jnp.concatenate([dxm[B:], jnp.zeros_like(dxm[:B])]),
                dxm)
            # ownership mask over dxm rows: each interior node is owned by
            # exactly one shard. c>0: local rows B..C-1 (global cC..
            # (c+1)C-B-1). c=0: after the dummy shift dxm row j is global
            # node j, interiors are rows 0..C-B-1.
            own = jnp.zeros((C + B,), dtype).at[B:C].set(1.0)
            own0 = jnp.zeros((C + B,), dtype).at[0:C - B].set(1.0)
            own = jnp.where(c == 0, own0, own)
            dx_int = jax.lax.psum(
                jnp.zeros((N, NODE_DOF), dtype).at[
                    start + jnp.arange(C + B)
                ].add(dxm * own[:, None]),
                AXIS,
            )
            # separator band s sits at nodes (s+1)C-B .. (s+1)C-1
            sep_nodes = (
                ((jnp.arange(S) + 1) * C - B)[:, None] + jnp.arange(B)[None]
            ).reshape(-1)
            dx_nodes = dx_int.at[sep_nodes].set(
                dx_b.reshape(S * B, NODE_DOF))
            return dx_nodes, dx_l, cost

        def total_cost(nodes, lm_invd):
            return jax.lax.psum(_cost_local(shard_at(nodes, lm_invd), params),
                                AXIS)

        def body(carry):
            it, done, nodes, lm_invd, lam, cost_cur, nacc = carry
            dx_nodes, dx_l, _ = step(nodes, lm_invd, lam)
            nodes_new = node_boxplus(nodes, dx_nodes)
            lm_new = lm_invd + dx_l
            cost_new = total_cost(nodes_new, lm_new)
            accept = cost_new < cost_cur
            nodes_out = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), nodes_new, nodes)
            lm_out = jnp.where(accept, lm_new, lm_invd)
            lam_out = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                                lam * 4.0)
            cost_out = jnp.where(accept, cost_new, cost_cur)
            converged = accept & (jnp.abs(cost_cur - cost_new)
                                  < 1e-6 * jnp.maximum(cost_cur, 1e-30))
            return (it + 1, converged | (lam_out > 1e10), nodes_out, lm_out,
                    lam_out, cost_out, nacc + accept.astype(jnp.int32))

        def cond(carry):
            it, done, *_ = carry
            return (it < iters) & ~done

        nodes0 = ba_sh.nodes
        lm0 = squeeze(ba_sh.lm_invdepth)
        cost0 = total_cost(nodes0, lm0)
        it, _, nodes1, lm1, lam1, cost1, nacc = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), jnp.asarray(False), nodes0, lm0,
             jnp.asarray(lam0, dtype), cost0, jnp.asarray(0, jnp.int32)),
        )
        return nodes1, lm1[None], (cost0, cost1, nacc, it)

    spec = _shard_spec(ba)
    repl = P()
    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(jax.tree.map(lambda _: repl, ba.nodes), P(AXIS),
                   (repl, repl, repl, repl)),
        check_vma=False,
    )
    nodes1, lm1, stats = fn(ba)
    return ba._replace(nodes=nodes1, lm_invdepth=lm1), stats
