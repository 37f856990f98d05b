"""Multi-device sharded Schur-complement Gauss-Newton step.

The scalability axis of this problem (SURVEY §5.7) is the landmark set: the
reduced camera system ``H_red = Hxx - sum_l Hxl_l hll_l^-1 Hlx_l`` is a sum
of per-landmark rank-1-ish contributions, so it shards embarrassingly over
landmarks. Each device holds a landmark shard (observations, inverse
depths), computes its local contribution to the reduced system, and a
``psum`` over the mesh gives every device the full H_red; the tiny reduced
solve is replicated, and landmark back-substitution stays local.

Collectives ride the mesh (ICI within a slice, DCN across hosts) — no NCCL,
no explicit communication code beyond ``psum``/shard_map, exactly the
XLA-native analog of the reference's Ceres DENSE_SCHUR threading
(``ic_gvins.cc:1178-1180``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.types import IntegrationParams
from ..solver import assembly as asm
from ..solver.window import NODE_DOF, Prior, SolverConfig, Window


def _reproj_blocks(window: Window, cfg: SolverConfig):
    """Per-landmark-shard reprojection contributions.

    Returns (Hxx_v [DX,DX], gx_v [DX], Hxl [DX,Ll], hll [Ll], gl [Ll]).
    Runs *inside* shard_map: `window` carries the local landmark shard.
    """
    N = window.n_nodes
    L = window.n_landmarks  # local shard size inside shard_map
    DX = window.dim_x
    dtype = window.nodes.p.dtype

    r_v, J_v = asm.eval_reproj(window, cfg)  # [L,N,2], [L,N,2,20]
    chi = jnp.sum(r_v**2, axis=-1)
    w = asm.huber_weight(chi)

    Jx = J_v[..., :19]  # ref(6) obs(6) ext(6) td(1)
    Jl = J_v[..., 19]  # [L,N,2]

    node_cols = jnp.arange(N)[:, None] * NODE_DOF + jnp.arange(NODE_DOF)[None, :]
    ref_cols = jnp.broadcast_to(node_cols[window.lm_ref][:, None, :6], (L, N, 6))
    obs_cols = jnp.broadcast_to(node_cols[None, :, :6], (L, N, 6))
    extc = N * NODE_DOF + jnp.arange(6)
    extb = jnp.broadcast_to(extc[None, None, :], (L, N, 6))
    tdb = jnp.broadcast_to(jnp.array([N * NODE_DOF + 6]), (L, N, 1))
    cols = jnp.concatenate([ref_cols, obs_cols, extb, tdb], axis=-1)  # [L,N,19]

    Hxx = jnp.zeros((DX, DX), dtype)
    gx = jnp.zeros(DX, dtype)
    Hxx = Hxx.at[cols[:, :, :, None], cols[:, :, None, :]].add(
        w[..., None, None] * jnp.einsum("lkrc,lkrd->lkcd", Jx, Jx)
    )
    gx = gx.at[cols].add(w[..., None] * jnp.einsum("lkrc,lkr->lkc", Jx, r_v))

    # cross and landmark-diagonal terms, per local landmark
    Hxl_rows = w[..., None] * jnp.einsum("lkrc,lkr->lkc", Jx, Jl)  # [L,N,19]
    Hxl = jnp.zeros((DX, L), dtype)
    lidx = jnp.broadcast_to(jnp.arange(L)[:, None, None], (L, N, 19))
    Hxl = Hxl.at[cols, lidx].add(Hxl_rows)
    hll = jnp.sum(w[..., None] * Jl * Jl, axis=(1, 2))  # [L]
    gl = jnp.sum(w * jnp.einsum("lkr,lkr->lk", Jl, r_v), axis=1)  # [L]
    return Hxx, gx, Hxl, hll, gl


def _state_system(window: Window, prior: Prior, cfg: SolverConfig,
                  params: IntegrationParams):
    """H, g over states only from the non-vision factors (replicated)."""
    N = window.n_nodes
    DX = window.dim_x
    dtype = window.nodes.p.dtype
    H = jnp.zeros((DX, DX), dtype)
    g = jnp.zeros(DX, dtype)
    node_cols = jnp.arange(N)[:, None] * NODE_DOF + jnp.arange(NODE_DOF)[None, :]

    r_pre, J_pre = asm.eval_preint(window, params)
    cols_pre = asm.preint_delta_cols(window)
    H = H.at[cols_pre[:, :, None], cols_pre[:, None, :]].add(
        jnp.einsum("frc,frd->fcd", J_pre, J_pre)
    )
    g = g.at[cols_pre].add(jnp.einsum("frc,fr->fc", J_pre, r_pre))

    r_g, J_g = asm.eval_gnss(window, cfg)
    chi_g = jnp.sum(r_g**2, axis=-1)
    w_g = asm.huber_weight(chi_g)
    cols_g = node_cols[:, :6]
    H = H.at[cols_g[:, :, None], cols_g[:, None, :]].add(
        w_g[:, None, None] * jnp.einsum("frc,frd->fcd", J_g, J_g)
    )
    g = g.at[cols_g].add(w_g[:, None] * jnp.einsum("frc,fr->fc", J_g, r_g))

    r_b, J_b, k_new = asm.eval_bias_prior(window, cfg)
    cols_b = node_cols[k_new]
    H = H.at[cols_b[:, None], cols_b[None, :]].add(J_b.T @ J_b)
    g = g.at[cols_b].add(J_b.T @ r_b)

    P, grad_p, _ = asm.eval_prior(window, prior)
    H = H + P
    g = g + grad_p
    return H, g


def sharded_gn_step(
    window: Window,
    prior: Prior,
    cfg: SolverConfig,
    params: IntegrationParams,
    mesh: Mesh,
    lam: float = 1e-4,
):
    """One Gauss-Newton step with landmarks sharded over mesh axis 'lm'.

    Returns the updated window (nodes/ext replicated, landmark shard local).
    Landmark count must divide the mesh size.
    """
    axis = "lm"
    lm_sharded = lambda *tail: NamedSharding(mesh, P(axis, *tail))
    repl = NamedSharding(mesh, P())

    def step(win_shard: Window, prior_, cfg_, params_):
        # states system is replicated work (tiny); vision shards over lm
        Hx, gx = _state_system(win_shard, prior_, cfg_, params_)
        Hxx_v, gx_v, Hxl, hll, gl = _reproj_blocks(win_shard, cfg_)
        Hx = Hx + jax.lax.psum(Hxx_v, axis)
        gx = gx + jax.lax.psum(gx_v, axis)

        lm_free = (
            win_shard.lm_valid & (jnp.sum(asm.obs_mask(win_shard), axis=1) > 0)
        ).astype(hll.dtype)
        hll = jnp.where(lm_free > 0, hll, 1.0)
        hll_d = hll * (1.0 + lam)

        H_red = Hx - jax.lax.psum((Hxl / hll_d[None, :]) @ Hxl.T, axis)
        g_red = gx - jax.lax.psum(Hxl @ (gl * lm_free / hll_d), axis)

        # damp + freeze invalid state dims (replicated solve)
        node_free = jnp.repeat(win_shard.node_valid, NODE_DOF)
        ext_free = jnp.concatenate(
            [jnp.full(6, cfg_.estimate_extrinsic, bool),
             jnp.array([cfg_.estimate_td]),
             jnp.array([cfg_.estimate_sodo & asm.is_odo_window(win_shard)])]
        )
        free = jnp.concatenate([node_free, ext_free]).astype(Hx.dtype)
        H_red = H_red * free[:, None] * free[None, :]
        g_red = g_red * free
        dH = jnp.diag(H_red)
        H_red = H_red + jnp.diag(lam * dH + jnp.where(dH < 1e-12, 1.0, 0.0))

        chol = jnp.linalg.cholesky(
            H_red + 1e-12 * jnp.eye(H_red.shape[0], dtype=Hx.dtype)
        )
        dx_x = -jax.scipy.linalg.cho_solve((chol, True), g_red)
        dx_l = -lm_free * (gl + Hxl.T @ dx_x) / hll_d

        from ..solver.window import apply_delta

        dx = jnp.concatenate([dx_x, dx_l])
        return apply_delta(win_shard, dx)

    lm_axes = Window(
        nodes=jax.tree.map(lambda _: P(), window.nodes),
        node_valid=P(), node_is_kf=P(),
        preint=jax.tree.map(lambda _: P(), window.preint),
        preint_valid=P(),
        gnss_p=P(), gnss_std=P(), gnss_std_base=P(), gnss_valid=P(),
        ext_p=P(), ext_q=P(), td=P(), sodo=P(), frame_td=P(),
        lm_invdepth=P(axis), lm_ref=P(axis), lm_valid=P(axis),
        obs_uv=P(axis), obs_vel=P(axis), obs_valid=P(axis),
    )
    prior_axes = jax.tree.map(lambda _: P(), prior)
    cfg_axes = jax.tree.map(lambda _: P(), cfg)
    params_axes = jax.tree.map(lambda _: P(), params)

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(lm_axes, prior_axes, cfg_axes, params_axes),
        out_specs=lm_axes,
        check_vma=False,
    )
    return fn(window, prior, cfg, params)
