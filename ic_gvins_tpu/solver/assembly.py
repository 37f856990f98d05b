"""Normal-equation assembly: vmapped autodiff factor blocks -> H, g.

Replaces Ceres problem construction + Jacobian evaluation
(``ic_gvins.cc:1164-1273`` with the factor classes of §2.3/§2.4) by:

* evaluating every factor's whitened residual as a pure function of the
  small local delta of the parameters it touches,
* getting the exact Jacobian blocks with ``jax.jacfwd`` at delta = 0
  (vmapped over all factors of a class at once),
* scatter-adding the weighted blocks into the dense normal equations
  ``H dx = -g`` over the fixed window layout (see ``window.py``).

Robustification is IRLS: Huber weight ``rho'(chi2)`` scales each factor's
(H, g) contribution; the robust cost ``0.5 * sum(rho(chi2))`` drives the
LM accept/reject logic — mirroring Ceres' corrector semantics for
HuberLoss(1.0).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.types import IntegrationParams, NavState
from ..factors.manifold import node_boxplus, pose_boxplus
from ..factors.residuals import (
    bias_soft_residual,
    gnss_residual,
    reprojection_residual,
)
from ..ins.preintegration import preint_residual, sqrt_information
from ..ins.preintegration_odo import OdoPreintData, preint_odo_residual
from .window import EXT_DOF, EXTTD_DOF, NODE_DOF, Prior, SolverConfig, Window


def is_odo_window(window: Window) -> bool:
    """Static mode check: does this window carry odometer-augmented
    preintegration (the ODO/EARTH_ODO variants)?"""
    return isinstance(window.preint, OdoPreintData)


class RobustFlags(NamedTuple):
    gnss_kernel: jax.Array  # () bool
    reproj_kernel: jax.Array  # () bool


class FactorSel(NamedTuple):
    """Optional sub-selection of factors for assembly (all-ones = every
    factor). The marginalization path restricts assembly to the factors
    touching node 0 (parity with the ResidualBlockInfo set wrapped at
    ``ic_gvins.cc:1516-1644``) while reusing the same scatter-free
    einsum assembly as the solver."""

    preint: jax.Array  # [N-1] bool
    gnss: jax.Array  # [N] bool
    reproj: jax.Array  # [L] bool (per-landmark)


def huber_rho(s):
    return jnp.where(s <= 1.0, s, 2.0 * jnp.sqrt(jnp.maximum(s, 1.0)) - 1.0)


def huber_weight(s):
    return jnp.minimum(1.0, 1.0 / jnp.sqrt(jnp.maximum(s, 1e-30)))


def _node(window: Window, i) -> NavState:
    return jax.tree.map(lambda x: x[i], window.nodes)


def _preint_i(window: Window, i):
    return jax.tree.map(lambda x: x[i], window.preint)


# ---------------------------------------------------------------------------
# Per-factor residual functions of their local deltas (delta = 0 at estimate)
# ---------------------------------------------------------------------------


def _preint_res(window: Window, params: IntegrationParams, i, delta30):
    """UNWHITENED residual as a function of the local delta. The sqrt-info
    whitening is applied OUTSIDE the differentiated function (the [15,15]
    inv+cholesky of ``sqrt_information`` depends only on the preintegration
    covariance — constant over the whole LM solve — yet used to re-run in
    the primal of every residual eval, jacfwd, and cost probe: ~3x per
    iteration per interval of sequential TPU linear algebra)."""
    s0 = node_boxplus(_node(window, i), delta30[:NODE_DOF])
    s1 = node_boxplus(_node(window, i + 1), delta30[NODE_DOF:])
    pre = _preint_i(window, i)
    return preint_residual(pre, s0, s1, params, whiten=False)


def _preint_res_odo(window: Window, params: IntegrationParams, i, delta31):
    """Odometer-augmented variant (unwhitened, see ``_preint_res``):
    19-dim residual over [node i (15) | node i+1 (15) | sodo (1)]. The
    window-global sodo enters both ends, so the reference's random-walk
    row (sodo1 - sodo0) is identically zero — the scale link across
    intervals is the shared state itself."""
    s0 = node_boxplus(_node(window, i), delta31[:NODE_DOF])
    s1 = node_boxplus(_node(window, i + 1), delta31[NODE_DOF : 2 * NODE_DOF])
    sodo = window.sodo + delta31[2 * NODE_DOF]
    pre = _preint_i(window, i)
    return preint_odo_residual(pre, s0, sodo, s1, sodo, params, whiten=False)


def preint_sqrt_info(window: Window) -> jax.Array:
    """[N-1, R, R] whitening matrices for all intervals (vectorized once;
    see ``_preint_res`` for why this lives outside the residual fn)."""
    return sqrt_information(window.preint.cov)


def preint_res_fn(window: Window):
    """(residual fn, delta dim) for this window's preintegration variant."""
    if is_odo_window(window):
        return _preint_res_odo, 2 * NODE_DOF + 1
    return _preint_res, 2 * NODE_DOF


def preint_delta_cols(window: Window) -> jax.Array:
    """[N-1, C] global column indices of each interval's factor delta."""
    N = window.n_nodes
    node_cols = jnp.arange(N)[:, None] * NODE_DOF + jnp.arange(NODE_DOF)[None, :]
    cols = jnp.concatenate([node_cols[:-1], node_cols[1:]], axis=1)
    if is_odo_window(window):
        sodo_col = jnp.full((N - 1, 1), N * NODE_DOF + 7, cols.dtype)
        cols = jnp.concatenate([cols, sodo_col], axis=1)
    return cols


def _gnss_res(window: Window, cfg: SolverConfig, k, delta6):
    node = _node(window, k)
    p, q = pose_boxplus(node.p, node.q, delta6)
    std = jnp.maximum(window.gnss_std[k], 1e-6)
    return gnss_residual(p, q, cfg.antlever, window.gnss_p[k], std)


def _reproj_res(window: Window, cfg: SolverConfig, l, k, delta20):
    """delta20 = [ref pose 6 | obs pose 6 | ext 6 | td 1 | invdepth 1]."""
    ref = window.lm_ref[l]
    nref = _node(window, ref)
    nobs = _node(window, k)
    p0, q0 = pose_boxplus(nref.p, nref.q, delta20[0:6])
    p1, q1 = pose_boxplus(nobs.p, nobs.q, delta20[6:12])
    tic, qic = pose_boxplus(window.ext_p, window.ext_q, delta20[12:18])
    td = window.td + delta20[18]
    invd = window.lm_invdepth[l] + delta20[19]
    invd = jnp.where(jnp.abs(invd) < 1e-4, 1e-4, invd)  # guard division
    return reprojection_residual(
        p0, q0, p1, q1, tic, qic, invd, td,
        window.obs_uv[l, ref], window.obs_uv[l, k],
        window.obs_vel[l, ref], window.obs_vel[l, k],
        window.frame_td[ref], window.frame_td[k],
        cfg.reproj_std,
    )


def _bias_res(window: Window, cfg: SolverConfig, k, delta15):
    node = node_boxplus(_node(window, k), delta15)
    return bias_soft_residual(
        node.bg, node.ba, cfg.bias_prior_bg_std, cfg.bias_prior_ba_std
    )


# ---------------------------------------------------------------------------
# Masks and batched residual/Jacobian evaluation
# ---------------------------------------------------------------------------


def preint_mask(window: Window):
    return (
        window.preint_valid
        & window.node_valid[:-1]
        & window.node_valid[1:]
    )


def gnss_mask(window: Window):
    return window.gnss_valid & window.node_valid


def obs_mask(window: Window):
    """[L, N] reprojection factor mask: valid obs in a valid keyframe node,
    valid landmark, anchored at a *different* valid keyframe node."""
    L, N = window.obs_valid.shape
    ref_valid = window.node_valid[window.lm_ref] & window.node_is_kf[window.lm_ref]
    k_idx = jnp.arange(N)[None, :]
    not_ref = k_idx != window.lm_ref[:, None]
    return (
        window.obs_valid
        & window.lm_valid[:, None]
        & ref_valid[:, None]
        & (window.node_valid & window.node_is_kf)[None, :]
        & not_ref
    )


def newest_node_index(window: Window):
    N = window.n_nodes
    return N - 1 - jnp.argmax(jnp.flip(window.node_valid))


def eval_preint(window: Window, params: IntegrationParams):
    """WHITENED residuals [N-1,R] and Jacobians [N-1,R,C], masked
    (R,C = 15,30 plain / 19,31 odometer-augmented). Whitening is one
    batched matmul after the raw evals. The plain variant uses the
    ANALYTIC factor Jacobians (``ins/preintegration.py::
    preint_residual_jac``, reference preintegration_normal.cc:73-142);
    the odometer variant keeps jacfwd."""
    from ..ins.preintegration import preint_residual_jac

    N = window.n_nodes
    idx = jnp.arange(N - 1)
    if is_odo_window(window):
        res_fn, dim = preint_res_fn(window)
        z = jnp.zeros(dim, window.nodes.p.dtype)

        def one(i):
            fn = partial(res_fn, window, params, i)
            return fn(z), jax.jacfwd(fn)(z)

        r, J = jax.vmap(one)(idx)
    else:
        def one(i):
            return preint_residual_jac(
                _preint_i(window, i), _node(window, i),
                _node(window, i + 1), params,
            )

        r, J = jax.vmap(one)(idx)
    S = preint_sqrt_info(window)
    r = jnp.einsum("fij,fj->fi", S, r)
    J = jnp.einsum("fij,fjc->fic", S, J)
    m = preint_mask(window).astype(r.dtype)
    return r * m[:, None], J * m[:, None, None]


def eval_gnss(window: Window, cfg: SolverConfig):
    N = window.n_nodes
    idx = jnp.arange(N)
    z = jnp.zeros(6, window.nodes.p.dtype)

    def one(k):
        fn = partial(_gnss_res, window, cfg, k)
        return fn(z), jax.jacfwd(fn)(z)

    r, J = jax.vmap(one)(idx)
    m = gnss_mask(window).astype(r.dtype)
    return r * m[:, None], J * m[:, None, None]


def eval_reproj(window: Window, cfg: SolverConfig):
    """Residuals [L,N,2], Jacobians [L,N,2,20], masked.

    Stays on jacfwd: the closed-form Jacobian
    (``factors/residuals.py::reprojection_residual_jac``, validated
    against jacfwd to 1e-8) was MEASURED SLOWER on TPU — optimize went
    35.5 -> 55 ms; jacfwd's 20 tangents form one well-fused batched
    dimension, while the analytic version's many small per-factor 2x3/3x3
    products lower to scalar-ish code under the double vmap. The analytic
    form remains as the documentation/validation reference (the
    reference's hand-derived Jacobians, reprojection_factor.h:102-158)."""
    L, N = window.obs_valid.shape
    z = jnp.zeros(20, window.nodes.p.dtype)

    def one(l, k):
        fn = partial(_reproj_res, window, cfg, l, k)
        return fn(z), jax.jacfwd(fn)(z)

    r, J = jax.vmap(jax.vmap(one, in_axes=(None, 0)), in_axes=(0, None))(
        jnp.arange(L), jnp.arange(N)
    )
    m = obs_mask(window).astype(r.dtype)
    return r * m[..., None], J * m[..., None, None]


def eval_reproj_res(window: Window, cfg: SolverConfig):
    """Masked reprojection residuals only [L,N,2] — no Jacobians. The
    per-round statistics/culling path needs just the pixel errors;
    evaluating the 20-tangent jacfwd there (and eagerly) was measured as
    42% of the CPU replay wall (round-5 profile)."""
    L, N = window.obs_valid.shape
    z = jnp.zeros(20, window.nodes.p.dtype)
    r = jax.vmap(
        jax.vmap(lambda l, k: _reproj_res(window, cfg, l, k, z),
                 in_axes=(None, 0)),
        in_axes=(0, None),
    )(jnp.arange(L), jnp.arange(N))
    m = obs_mask(window).astype(r.dtype)
    return r * m[..., None]


def eval_bias_prior(window: Window, cfg: SolverConfig):
    k = newest_node_index(window)
    z = jnp.zeros(NODE_DOF, window.nodes.p.dtype)
    fn = partial(_bias_res, window, cfg, k)
    r, J = fn(z), jax.jacfwd(fn)(z)
    m = jnp.any(window.node_valid).astype(r.dtype)
    return r * m, J * m, k


def eval_prior(window: Window, prior: Prior):
    """Marginalization prior quadratic form at the current estimate:
    ``(H0 [DX,DX], grad [DX], cost2)`` with grad = g + H dx and
    cost2 = dx^T H dx + 2 g^T dx (twice the cost, up to the constant the
    LM accept/reject never sees). The eigen square root of the reference
    (``marginalization_info.h:153-167``) exists only because Ceres factors
    must return residual vectors; this solver consumes the GN pieces
    directly."""
    from .window import state_boxminus

    dx = state_boxminus(window, prior)
    Hdx = prior.H @ dx
    return prior.H, prior.g + Hdx, dx @ Hdx + 2.0 * (prior.g @ dx)


# ---------------------------------------------------------------------------
# Cost / assembly
# ---------------------------------------------------------------------------


def _residuals_only(window: Window, cfg: SolverConfig,
                    params: IntegrationParams):
    """Primal residuals without the jacfwd tangent pass — the cost probe
    runs once per LM iteration at the trial point, where Jacobians are
    never needed (XLA does not reliably DCE an unused jacfwd)."""
    dtype = window.nodes.p.dtype
    N = window.n_nodes
    L = window.n_landmarks

    res_fn, dim = preint_res_fn(window)
    z_pre = jnp.zeros(dim, dtype)
    r_pre = jax.vmap(lambda i: res_fn(window, params, i, z_pre))(
        jnp.arange(N - 1)
    )
    r_pre = jnp.einsum("fij,fj->fi", preint_sqrt_info(window), r_pre)
    r_pre = r_pre * preint_mask(window).astype(dtype)[:, None]

    z6 = jnp.zeros(6, dtype)
    r_g = jax.vmap(lambda k: _gnss_res(window, cfg, k, z6))(jnp.arange(N))
    r_g = r_g * gnss_mask(window).astype(dtype)[:, None]

    z20 = jnp.zeros(20, dtype)
    r_v = jax.vmap(
        jax.vmap(lambda l, k: _reproj_res(window, cfg, l, k, z20),
                 in_axes=(None, 0)),
        in_axes=(0, None),
    )(jnp.arange(L), jnp.arange(N))
    r_v = r_v * obs_mask(window).astype(dtype)[..., None]

    k_new = newest_node_index(window)
    r_b = _bias_res(window, cfg, k_new, jnp.zeros(NODE_DOF, dtype))
    r_b = r_b * jnp.any(window.node_valid).astype(dtype)
    return r_pre, r_g, r_v, r_b


def robust_cost(
    window: Window,
    prior: Prior,
    cfg: SolverConfig,
    params: IntegrationParams,
    flags: RobustFlags,
    axis_name: str | None = None,
):
    """Total robust cost 0.5 * sum(rho(chi2)) over all factors. With
    ``axis_name`` the landmark-sharded vision term is ``psum``-ed."""
    r_pre, r_g, r_v, r_b = _residuals_only(window, cfg, params)
    _, _, prior_cost2 = eval_prior(window, prior)

    chi_g = jnp.sum(r_g**2, axis=-1)
    chi_v = jnp.sum(r_v**2, axis=-1)
    cost_v = jnp.sum(jnp.where(flags.reproj_kernel, huber_rho(chi_v), chi_v))
    if axis_name is not None:
        cost_v = jax.lax.psum(cost_v, axis_name)
    cost = 0.5 * (
        jnp.sum(r_pre**2)
        + jnp.sum(jnp.where(flags.gnss_kernel, huber_rho(chi_g), chi_g))
        + cost_v
        + jnp.sum(r_b**2)
        + prior_cost2
    )
    if is_odo_window(window):
        cost = cost + 0.5 * (window.sodo / cfg.sodo_prior_std) ** 2
    return cost


def assemble_blocks(
    window: Window,
    prior: Prior,
    cfg: SolverConfig,
    params: IntegrationParams,
    flags: RobustFlags,
    axis_name: str | None = None,
    sel: FactorSel | None = None,
    include_soft_priors: bool = True,
    gauge_fix: bool = True,
):
    """Build the Schur-structured normal equations as blocks:

    ``(Hxx [DX,DX], gx [DX], Hxl [DX,L], hll [L], gl [L], cost)``

    with the free-parameter mask already applied (frozen/invalid dims get
    zero rows/cols and a unit diagonal).

    Fully scatter-free: XLA lowers scatter-adds into a dense matrix to
    serialized per-index updates on TPU, so every factor's contribution is
    accumulated into dense block tensors (node-node [N,15,N,15], node-ext
    [N,15,8], ext-ext [8,8], landmark cross/diag) via einsum reductions —
    dynamic node indices become one-hot contractions (MXU-friendly) — and
    the final H is one block composition (three concatenates).

    **Multi-device**: with ``axis_name`` set (inside ``shard_map`` with the
    landmark dimension sharded over that mesh axis), the vision
    contributions to the state system and the vision cost are ``psum``-ed,
    so ``Hxx/gx/cost`` come out full while ``Hxl/hll/gl`` stay local to the
    calling shard — the TPU analog of Ceres DENSE_SCHUR threading
    (``ic_gvins.cc:1178-1180``) over ICI instead of cores.
    """
    N, L = window.n_nodes, window.n_landmarks
    DX = window.dim_x
    dtype = window.nodes.p.dtype
    NL = N * NODE_DOF
    ED = EXT_DOF  # 6 ext + td + sodo

    Hnn = jnp.zeros((N, NODE_DOF, N, NODE_DOF), dtype)
    Hne = jnp.zeros((N, NODE_DOF, ED), dtype)
    Hee = jnp.zeros((ED, ED), dtype)
    g_n = jnp.zeros((N, NODE_DOF), dtype)
    g_e = jnp.zeros(ED, dtype)

    # --- preintegration factors (block-tridiagonal via one-hot einsums) ---
    r_pre, J_pre = eval_preint(window, params)
    if sel is not None:
        m_sel = sel.preint.astype(dtype)
        r_pre, J_pre = r_pre * m_sel[:, None], J_pre * m_sel[:, None, None]
    Ji = J_pre[..., :NODE_DOF]  # w.r.t. node i
    Jj = J_pre[..., NODE_DOF : 2 * NODE_DOF]  # w.r.t. node i+1
    Pi = jnp.eye(N, dtype=dtype)[: N - 1]  # one-hot of i
    Pj = jnp.eye(N, dtype=dtype)[1:]  # one-hot of i+1
    Aii = jnp.einsum("frc,frd->fcd", Ji, Ji)
    Ajj = jnp.einsum("frc,frd->fcd", Jj, Jj)
    Aij = jnp.einsum("frc,frd->fcd", Ji, Jj)
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pi, Pi, Aii)
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pj, Pj, Ajj)
    Hnn = Hnn + jnp.einsum("fa,fb,fcd->acbd", Pi, Pj, Aij)
    Hnn = Hnn + jnp.einsum("fa,fb,fdc->acbd", Pj, Pi, Aij)
    g_n = g_n + jnp.einsum("fa,frc,fr->ac", Pi, Ji, r_pre)
    g_n = g_n + jnp.einsum("fa,frc,fr->ac", Pj, Jj, r_pre)
    if is_odo_window(window):
        Js = J_pre[..., 2 * NODE_DOF]  # w.r.t. the global sodo scale
        sodo_onehot = jnp.zeros(ED, dtype).at[7].set(1.0)
        His = jnp.einsum("fa,frc,fr->ac", Pi, Ji, Js) + jnp.einsum(
            "fa,frc,fr->ac", Pj, Jj, Js
        )
        Hne = Hne + His[:, :, None] * sodo_onehot
        Hee = Hee.at[7, 7].add(jnp.einsum("fr,fr->", Js, Js))
        g_e = g_e.at[7].add(jnp.einsum("fr,fr->", Js, r_pre))
    cost = 0.5 * jnp.sum(r_pre**2)

    # --- GNSS factors (Huber-weighted IRLS), diagonal pose blocks ---
    r_g, J_g = eval_gnss(window, cfg)
    if sel is not None:
        m_sel = sel.gnss.astype(dtype)
        r_g, J_g = r_g * m_sel[:, None], J_g * m_sel[:, None, None]
    chi_g = jnp.sum(r_g**2, axis=-1)
    w_g = jnp.where(flags.gnss_kernel, huber_weight(chi_g), jnp.ones_like(chi_g))
    A_g = w_g[:, None, None] * jnp.einsum("frc,frd->fcd", J_g, J_g)  # [N,6,6]
    E = jnp.eye(N, dtype=dtype)
    Hnn = Hnn.at[:, 0:6, :, 0:6].add(
        jnp.einsum("ka,kb,kcd->acbd", E, E, A_g)
    )
    g_n = g_n.at[:, 0:6].add(w_g[:, None] * jnp.einsum("frc,fr->fc", J_g, r_g))
    cost = cost + 0.5 * jnp.sum(
        jnp.where(flags.gnss_kernel, huber_rho(chi_g), chi_g)
    )

    # --- reprojection factors (landmark-dim: shardable, own accumulators) ---
    r_v, J_v = eval_reproj(window, cfg)  # [L,N,2], [L,N,2,20]
    if sel is not None:
        m_sel = sel.reproj.astype(dtype)
        r_v = r_v * m_sel[:, None, None]
        J_v = J_v * m_sel[:, None, None, None]
    chi_v = jnp.sum(r_v**2, axis=-1)
    w_v = jnp.where(flags.reproj_kernel, huber_weight(chi_v), jnp.ones_like(chi_v))
    Jr = J_v[..., 0:6]  # ref-pose block
    Jo = J_v[..., 6:12]  # obs-pose block
    Je = J_v[..., 12:19]  # extrinsic + td block
    Jl = J_v[..., 19]  # landmark column
    wJr = w_v[..., None, None] * Jr
    wJo = w_v[..., None, None] * Jo
    wJe = w_v[..., None, None] * Je
    wJl = w_v[..., None] * Jl
    O = (window.lm_ref[:, None] == jnp.arange(N)[None, :]).astype(dtype)  # [L,N]

    H_oo = jnp.einsum("lkrc,lkrd->kcd", wJo, Jo)
    H_rr = jnp.einsum("la,lkrc,lkrd->acd", O, wJr, Jr)
    H_ro = jnp.einsum("la,lkrc,lkrd->akcd", O, wJr, Jo)
    # block (ref a, obs k) lives at [a, c, k, d]; its transpose at [k, d, a, c]
    Hpp_v = H_ro.transpose(0, 2, 1, 3) + H_ro.transpose(1, 3, 0, 2)
    Hpp_v = Hpp_v + jnp.einsum("ka,kb,kcd->acbd", E, E, H_oo + H_rr)

    H_oe = jnp.einsum("lkrc,lkrd->kcd", wJo, Je)
    H_re = jnp.einsum("la,lkrc,lkrd->acd", O, wJr, Je)
    Hne_v = H_oe + H_re  # [N,6,7]
    Hee_v = jnp.einsum("lkrc,lkrd->cd", wJe, Je)  # [7,7]

    hll = jnp.einsum("lkr,lkr->l", wJl, Jl)  # landmark diagonal (local)
    H_lo = jnp.einsum("lkr,lkrc->lkc", wJl, Jo)  # [L,N,6]
    H_lr = jnp.einsum("la,lkr,lkrc->lac", O, wJl, Jr)  # [L,N,6]
    Hln = jnp.zeros((L, N, NODE_DOF), dtype).at[:, :, 0:6].set(H_lo + H_lr)
    Hle = jnp.zeros((L, ED), dtype).at[:, :7].set(
        jnp.einsum("lkr,lkrc->lc", wJl, Je)
    )

    g_n_v = jnp.einsum("lkrc,lkr->kc", wJo, r_v) + jnp.einsum(
        "la,lkrc,lkr->ac", O, wJr, r_v
    )  # [N,6]
    g_e_v = jnp.einsum("lkrc,lkr->c", wJe, r_v)  # [7]
    g_l = jnp.einsum("lkr,lkr->l", wJl, r_v)

    cost_v = 0.5 * jnp.sum(
        jnp.where(flags.reproj_kernel, huber_rho(chi_v), chi_v)
    )
    if axis_name is not None:
        Hpp_v, Hne_v, Hee_v, g_n_v, g_e_v, cost_v = jax.lax.psum(
            (Hpp_v, Hne_v, Hee_v, g_n_v, g_e_v, cost_v), axis_name
        )
    Hnn = Hnn.at[:, 0:6, :, 0:6].add(Hpp_v)
    Hne = Hne.at[:, 0:6, :7].add(Hne_v)
    Hee = Hee.at[:7, :7].add(Hee_v)
    g_n = g_n.at[:, 0:6].add(g_n_v)
    g_e = g_e.at[:7].add(g_e_v)
    cost = cost + cost_v

    # --- soft bias prior on the newest node (one-hot embed) ---
    if include_soft_priors:
        r_b, J_b, k_new = eval_bias_prior(window, cfg)
        oh = (jnp.arange(N) == k_new).astype(dtype)
        Hnn = Hnn + jnp.einsum("a,b,cd->acbd", oh, oh, J_b.T @ J_b)
        g_n = g_n + oh[:, None] * (J_b.T @ r_b)
        cost = cost + 0.5 * jnp.sum(r_b**2)

    # --- soft odometer-scale prior (sigma_sodo = 0.02, imu_error_factor.h) ---
    if is_odo_window(window) and include_soft_priors:
        w_s = 1.0 / cfg.sodo_prior_std**2
        Hee = Hee.at[7, 7].add(w_s)
        g_e = g_e.at[7].add(w_s * window.sodo)
        cost = cost + 0.5 * w_s * window.sodo**2

    # --- marginalization / initialization prior (spans nodes + ext) ---
    P, g_pri, prior_cost2 = eval_prior(window, prior)
    Hnn = Hnn + P[:NL, :NL].reshape(N, NODE_DOF, N, NODE_DOF)
    Hne = Hne + P[:NL, NL:DX].reshape(N, NODE_DOF, ED)
    Hee = Hee + P[NL:DX, NL:DX]
    g_n = g_n + g_pri[:NL].reshape(N, NODE_DOF)
    g_e = g_e + g_pri[NL:DX]
    cost = cost + 0.5 * prior_cost2

    # --- compose the state block (no scatters) ---
    top = jnp.concatenate([Hnn.reshape(NL, NL), Hne.reshape(NL, ED)], 1)
    mid = jnp.concatenate([Hne.reshape(NL, ED).T, Hee], 1)
    Hxx = jnp.concatenate([top, mid], 0)
    gx = jnp.concatenate([g_n.reshape(-1), g_e])
    Hxl = jnp.concatenate([Hln.reshape(L, NL), Hle], 1).T  # [DX, L]

    # --- gauge fixing of unused / frozen parameters ---
    if gauge_fix:
        fx = free_mask_states(window, cfg).astype(dtype)
        fl = free_mask_lm(window).astype(dtype)
        Hxx = Hxx * fx[:, None] * fx[None, :]
        Hxx = Hxx + jnp.diag(jnp.where(jnp.diag(Hxx) < 1e-12, 1.0, 0.0))
        gx = gx * fx
        Hxl = Hxl * fx[:, None] * fl[None, :]
        hll = jnp.where(hll * fl < 1e-12, 1.0, hll * fl)
        gl = g_l * fl
    else:
        gl = g_l

    return Hxx, gx, Hxl, hll, gl, cost


def assemble(
    window: Window,
    prior: Prior,
    cfg: SolverConfig,
    params: IntegrationParams,
    flags: RobustFlags,
):
    """Full dense normal equations H [D,D], g [D] (H dx = -g) + robust
    cost — the single-matrix composition of :func:`assemble_blocks` (kept
    for single-program callers and tests)."""
    Hxx, gx, Hxl, hll, gl, cost = assemble_blocks(
        window, prior, cfg, params, flags
    )
    H = jnp.concatenate(
        [jnp.concatenate([Hxx, Hxl], 1),
         jnp.concatenate([Hxl.T, jnp.diag(hll)], 1)], 0
    )
    g = jnp.concatenate([gx, gl])
    return H, g, cost


def free_mask_states(window: Window, cfg: SolverConfig) -> jax.Array:
    """[DX] bool: state dims free to move (valid nodes + enabled ext/td)."""
    node_free = jnp.repeat(window.node_valid, NODE_DOF)
    ext_free = jnp.full(6, cfg.estimate_extrinsic, bool)
    td_free = jnp.array([cfg.estimate_td], bool)
    sodo_free = jnp.array([cfg.estimate_sodo & is_odo_window(window)], bool)
    return jnp.concatenate([node_free, ext_free, td_free, sodo_free])


def free_mask_lm(window: Window) -> jax.Array:
    """[L] bool: landmarks free to move (valid with >=1 live factor);
    local to the calling shard under ``shard_map``."""
    return window.lm_valid & (jnp.sum(obs_mask(window), axis=1) > 0)


def free_mask(window: Window, cfg: SolverConfig) -> jax.Array:
    """1.0 for parameters free to move, 0.0 for frozen/invalid ones."""
    dtype = window.nodes.p.dtype
    return jnp.concatenate(
        [free_mask_states(window, cfg), free_mask_lm(window)]
    ).astype(dtype)


def _ns_solve(A, b, iters: int = 26, refine: int = 3):
    """Solve A y = b for a symmetric PD, Jacobi-normalized A via
    Newton-Schulz inverse iteration plus iterative refinement.

    TPU rationale: XLA lowers Cholesky + the two triangular solves to a
    sequential blocked algorithm that dominates the LM iteration on these
    ~190-dim reduced systems; Newton-Schulz is nothing but dense matmuls
    (MXU), an order of magnitude faster here. X0 = I/max-row-sum gives
    ||I - A X0||_2 < 1 for any SPD A (Gershgorin), so the iteration is
    spectrally monotone; the refinement passes push the solution error to
    the dtype noise floor even when the inverse iterate is still coarse.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    rmax = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    X = eye / rmax

    def ns(X, _):
        return X @ (2.0 * eye - A @ X), None

    X, _ = jax.lax.scan(ns, X, None, length=iters)
    y = X @ b

    def ir(y, _):
        return y + X @ (b - A @ y), None

    y, _ = jax.lax.scan(ir, y, None, length=refine)
    return y


def solve_reduced(H_red, g_red):
    """Solve the reduced camera system (SPD) for y with H_red y = g_red.

    Jacobi-scales the system to unit diagonal before solving: whitened
    information spans ~1e2 (GNSS) to ~1e10 (preint bias links), and the
    scaled solve keeps full precision in f32 on TPU (the raw condition
    number exceeds f32's 7 digits). Exact in f64 too. f64 path: dense
    Cholesky (validation); f32 path: Newton-Schulz matmuls (MXU).
    """
    dtype = H_red.dtype
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H_red), eps))
    H_n = H_red * s[:, None] * s[None, :]
    H_n = H_n + eps * jnp.eye(H_n.shape[0], dtype=dtype)
    if dtype == jnp.float64:
        L = jnp.linalg.cholesky(H_n)
        y = jax.scipy.linalg.cho_solve((L, True), s * g_red)
    else:
        y = _ns_solve(H_n, s * g_red)
    return s * y


def schur_solve_blocks(Hxx, gx, Hxl, hll, gl, lam, axis_name=None):
    """Solve the damped system from :func:`assemble_blocks` outputs.

    Landmark elimination is a vectorized divide; the landmark-reduction
    terms of the reduced camera system are ``psum``-ed when ``axis_name``
    is given (landmarks sharded across the mesh); the tiny reduced solve is
    replicated; back-substitution stays shard-local. Returns
    ``(dx_x [DX], dx_l [L_local])``.
    """
    Hxx_d = Hxx + jnp.diag(lam * jnp.diag(Hxx))
    hll_d = hll * (1.0 + lam)

    Hxl_w = Hxl / hll_d[None, :]
    H_red_v = Hxl_w @ Hxl.T
    g_red_v = Hxl_w @ gl
    if axis_name is not None:
        H_red_v, g_red_v = jax.lax.psum((H_red_v, g_red_v), axis_name)
    H_red = Hxx_d - H_red_v
    g_red = gx - g_red_v

    dx_x = -solve_reduced(H_red, g_red)
    dx_l = -(gl + Hxl.T @ dx_x) / hll_d
    return dx_x, dx_l


def schur_solve(H, g, dim_x: int, lam):
    """Solve (H + lam*diag(H)) dx = -g with Schur elimination of the
    trailing landmark block (diagonal: landmarks never couple directly).

    This is the TPU analog of Ceres DENSE_SCHUR (``ic_gvins.cc:1178``): the
    landmark elimination is a vectorized divide; the reduced camera system
    solve is a dense Cholesky in f64 (validation path) and a Newton-Schulz
    matmul solve in f32 (the TPU execution path — see ``_ns_solve``).
    """
    dx_x, dx_l = schur_solve_blocks(
        H[:dim_x, :dim_x], g[:dim_x], H[:dim_x, dim_x:],
        jnp.maximum(jnp.diag(H)[dim_x:], 1e-12), g[dim_x:], lam,
    )
    return jnp.concatenate([dx_x, dx_l])
