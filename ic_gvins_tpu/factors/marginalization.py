"""Marginalization: fold the oldest node (+ its anchored landmarks) into a
dense prior, then slide the window.

Parity with the reference Schur-complement marginalization
(``factors/marginalization_info.h:153-253``, driven by
``ic_gvins.cc:1446-1712``), re-designed for fixed shapes:

* The factors being marginalized are the existing prior, the GNSS factor of
  node 0, the preintegration between nodes 0-1, and every reprojection
  factor anchored (reference keyframe) at node 0 — the same set the
  reference wraps into ResidualBlockInfos.
* Instead of re-indexing parameters marg-first, the elimination exploits
  the problem structure directly: anchored landmarks form a DIAGONAL block
  (vectorized divide), then node 0 is one 15x15 block elimination
  (eigen-pinv at that size for rank safety, reference EPS = 1e-8).
* The prior stays a quadratic form (H, g) around the linearization
  snapshot — the reference's eigen square root (J0, e0)
  (``marginalization_info.h:153-167``) exists only because Ceres factors
  must return residual vectors; this solver consumes J0^T J0 and J0^T e0,
  so no dense eigendecomposition is ever materialized.
* Sliding the window is a pytree roll + mask reset; the prior's node block
  (rows+cols of H, entries of g) and linearization snapshot roll with it.

Landmarks never appear in the resulting prior: anchored ones are
marginalized away, the rest touch no marginalized factor — matching the
reference, whose prior spans only poses/mixes/extrinsic/td.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.types import IntegrationParams
from ..solver.window import EXT_DOF, NODE_DOF, Prior, Window

EPS = 1e-8


def _eigh_pinv(A):
    w, v = jnp.linalg.eigh(0.5 * (A + A.T))
    w_inv = jnp.where(w > EPS, 1.0 / jnp.where(w > EPS, w, 1.0), 0.0)
    return (v * w_inv[None, :]) @ v.T


def _schur_eliminate_scaled(H1, g1, k: int):
    """Schur-eliminate the leading k dims of (H1, g1) with Jacobi
    pre-scaling — algebraically identical to the plain elimination, but
    the pinv operates on a unit-diagonal block whose conditioning is the
    correlation structure instead of the raw information spread.

    Unscaled, the node-0 block mixes ~1e2 (GNSS-pose) with ~1e9
    (preintegration bias-link) information; an f32 eigh of that matrix
    has garbage small eigenvectors and the reference's ABSOLUTE 1e-8
    eigenvalue gate (``marginalization_info.h:180``) keeps all of them —
    measured on the urban endurance replay as km-scale divergence
    starting at the FIRST marginalization in f32 (the prior's bias
    gradient comes out wrong and the chi2 ratchet then disables honest
    GNSS). The scaled elimination with a RELATIVE gate is exact in f64
    and stable in f32."""
    dtype = H1.dtype
    dH = jnp.diag(H1)
    floor = 1e-12 * jnp.maximum(jnp.max(dH), 1.0)
    # dims with (near-)zero diagonal carry no information — any off-
    # diagonal content there is rounding garbage, and the 1/sqrt(floor)
    # scaling would amplify it into enormous spurious couplings (measured
    # as ~1e15-scale indefiniteness of the resulting prior in f32 vision
    # runs). Excise those rows/cols end to end.
    present = (dH > floor).astype(dtype)
    s = present / jnp.sqrt(jnp.maximum(dH, floor))
    Hs = H1 * s[:, None] * s[None, :]
    # Correlation-bound clamp: any PSD matrix satisfies |H_ij| <=
    # sqrt(H_ii H_jj), i.e. |Hs_ij| <= 1 (diag(Hs) is exactly 1/0 by
    # construction). f32 cancellation garbage lands in ABSOLUTE terms
    # (~eps * intermediate magnitude) regardless of the entry's true
    # scale, so on dims with small diagonal the scaled garbage dwarfs the
    # legit structure (measured: scaled couplings up to ~1e5, which also
    # blows the sign-iteration's spectral normalization so the projection
    # below stops resolving them). The clip is exact for any true PSD
    # input and crushes the garbage to O(1).
    Hs = jnp.clip(Hs, -1.0, 1.0)
    gs = g1 * s

    A = 0.5 * (Hs[:k, :k] + Hs[:k, :k].T)
    B = Hs[:k, k:]
    w, v = jnp.linalg.eigh(A)
    rel = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-5, dtype)
    gate = rel * jnp.maximum(jnp.max(w), 1.0)
    w_inv = jnp.where(w > gate, 1.0 / jnp.where(w > gate, w, 1.0), 0.0)
    a_inv = (v * w_inv[None, :]) @ v.T

    Hp_s = Hs[k:, k:] - B.T @ a_inv @ B
    gp_s = gs[k:] - B.T @ (a_inv @ gs[:k])

    if dtype != jnp.float64:
        # PSD projection (f32 execution path only — f64 priors measured
        # exactly PSD): accumulated f32 rounding across slides leaves the
        # prior with NEGATIVE eigenvalues (measured: scaled eig_min -0.02
        # steady state, down to -2.9 in the init transient). An indefinite
        # prior hands LM a genuine descent direction of the COST — steps
        # along it are accepted, the next marginalization bakes them in,
        # and the bias runs away exponentially (the urban f32 failure at
        # t~52: ba doubling per round). Clip the negative part and remove
        # g's component in the clipped subspace (a linear term over zero
        # curvature would be an unbounded descent direction all the same).
        # The projection must be EXACT: an approximate (Newton-Schulz
        # sign-iteration) clip was measured to leave scaled residuals
        # ~1e-3 on near-eliminated directions, which the unscale turns
        # into O(1e4)-magnitude negative diagonals on dims whose
        # pre-elimination information was large (their legit post-Schur
        # info is ~0, so the residual dominates). Thanks to the
        # correlation clamp above, the scaled matrix is O(1)-bounded and
        # the f32 eigh is well-conditioned.
        # The gate is RELATIVE and applied to g as well: a direction with
        # near-zero (noise-level) curvature but a nonzero gradient is a
        # CONSTANT force with no restoring stiffness — the optimizer
        # settles where that force balances the measurements (measured as
        # a fake equilibrium ~38 m from full-weight GNSS, growing every
        # slide). In exact arithmetic g has no component outside range(H)
        # (the PSD Schur range condition); in f32 it's all noise, so both
        # H and g are truncated to the numerically-supported subspace.
        # Dropping a borderline-legit weak direction merely weakens the
        # prior (consistency-safe); keeping a spurious gradient is not.
        Hp_sym = 0.5 * (Hp_s + Hp_s.T)
        w2, v2 = jnp.linalg.eigh(Hp_sym)
        gate = 1e-5 * jnp.maximum(jnp.max(w2), 1e-30)
        keep = (w2 > gate).astype(dtype)
        Hp_s = (v2 * (w2 * keep)[None, :]) @ v2.T
        gp_s = v2 @ (keep * (v2.T @ gp_s))

    # unscale (multiply by sqrt(diag)); absent dims stay exactly zero
    u2 = (present * jnp.sqrt(jnp.maximum(dH, floor)))[k:]
    return Hp_s * u2[:, None] * u2[None, :], gp_s * u2


def _marg_blocks(window: Window, prior: Prior, cfg, params: IntegrationParams,
                 include_prior: bool = True):
    """Schur-structured blocks ``(Hxx, gx, Hxl, hll, gl)`` from only the
    factors touching node 0 — the existing prior, the node-0 GNSS factor,
    preintegration interval 0, and the reprojection factors anchored at
    node 0 (the ResidualBlockInfo set of ``ic_gvins.cc:1516-1644``).

    Reuses the scatter-free einsum assembly of ``solver/assembly.py``
    (round-2 measured XLA's TPU scatter lowering at ~20x the einsum path;
    this was 40% of the keyframe round in BENCH_r02). Parity note: the
    reference wraps every marginalized factor with a ``nullptr`` loss —
    the HuberLoss built at ic_gvins.cc:1591 is never passed — so no robust
    weighting is applied here either."""
    from ..solver import assembly as asm
    from ..solver.window import empty_prior

    N, L = window.n_nodes, window.n_landmarks
    sel = asm.FactorSel(
        preint=jnp.arange(N - 1) == 0,
        gnss=jnp.arange(N) == 0,
        reproj=(window.lm_ref == 0) & window.lm_valid,
    )
    flags = asm.RobustFlags(
        gnss_kernel=jnp.asarray(False), reproj_kernel=jnp.asarray(False)
    )
    if not include_prior:
        prior = empty_prior(N, window.nodes.p.dtype)._replace(
            lin_nodes=window.nodes, lin_ext_p=window.ext_p,
            lin_ext_q=window.ext_q, lin_td=window.td, lin_sodo=window.sodo,
        )
    Hxx, gx, Hxl, hll, gl, _ = asm.assemble_blocks(
        window, prior, cfg, params, flags,
        sel=sel, include_soft_priors=False, gauge_fix=False,
    )
    return Hxx, gx, Hxl, hll, gl


def _marg_system(window: Window, prior: Prior, cfg, params: IntegrationParams,
                 include_prior: bool = True):
    """Full dense (H, g) over [states | landmarks] from the node-0 factor
    set (kept for the exact-Schur regression test; the production path
    consumes :func:`_marg_blocks` directly)."""
    Hxx, gx, Hxl, hll, gl = _marg_blocks(window, prior, cfg, params,
                                         include_prior)
    H = jnp.concatenate(
        [jnp.concatenate([Hxx, Hxl], 1),
         jnp.concatenate([Hxl.T, jnp.diag(hll)], 1)], 0
    )
    g = jnp.concatenate([gx, gl])
    return H, g


def marginalize_node0(window: Window, prior: Prior, cfg, params,
                      forgetting: float = 1.0) -> Prior:
    """Compute the new prior (in pre-roll coordinates) from marginalizing
    node 0 and its anchored landmarks.

    TPU-first structure (replaces the reference's two dense
    eigendecompositions, ``marginalization_info.h:153-192``): the landmark
    block of H is DIAGONAL (inverse-depth landmarks never couple), so
    anchored landmarks are eliminated by a vectorized divide; node 0 is
    then a single 15x15 block elimination. The result stays a quadratic
    form (H, g) — no square-root factorization is ever materialized (see
    ``Prior``). Round-1 had two defects here: the Schur correction term
    was masked to zero (the prior kept the full uneliminated ~1e10
    bias-link information, freezing biases and compounding into drift —
    the "full mode diverges" mystery of VERDICT r1 #2), and the eigen
    square root cost ~18 ms/seq on TPU.

    ``forgetting`` < 1 discounts the resulting prior information by that
    factor (scaling H and g jointly keeps the implied mean)."""
    N, L = window.n_nodes, window.n_landmarks
    DX, D = window.dim_x, window.dim_total
    dtype = window.nodes.p.dtype

    Hxx, gx, Hxl, hll, gl = _marg_blocks(window, prior, cfg, params)

    # --- step 1: eliminate anchored landmarks (diagonal block) ---
    anchored = ((window.lm_ref == 0) & window.lm_valid).astype(dtype)
    hll_safe = jnp.where(anchored * hll > EPS, hll, 1.0)
    live = (anchored * hll > EPS).astype(dtype)  # anchored AND informative
    Hxl = Hxl * live[None, :]
    gl = gl * live
    H1 = Hxx - (Hxl / hll_safe[None, :]) @ Hxl.T
    g1 = gx - (Hxl / hll_safe[None, :]) @ gl

    # --- step 2: eliminate node 0 (15x15 block, Jacobi-scaled eigen-pinv
    # for rank safety AND f32 stability — see _schur_eliminate_scaled) ---
    Hp, gp = _schur_eliminate_scaled(H1, g1, NODE_DOF)

    if dtype != jnp.float64:
        # f32 execution path: carry the full Schur INFORMATION (H — the
        # cross-node structure that wins the outage/calibration A/Bs) but
        # anchor the prior MEAN at the marginalized estimate (g = 0).
        # The exact marginal gradient is a ~1e3-1e4-magnitude quantity
        # computed through 1e6-scale f32 cancellations (H·dx terms); its
        # ~1e-4-relative noise lands as CONSTANT forces in the prior's
        # weak directions, and the window settles where those forces
        # balance the measurements — measured as a growing offset from
        # full-weight GNSS (~tens of meters over 60 s urban). Zeroing g
        # (the estimate-anchored / information-filter approximation)
        # trades a small converged-window bias for the elimination of
        # every spurious-force path. The f64 validation path keeps the
        # exact gradient (reference parity).
        gp = jnp.zeros_like(gp)

    # embed back at the full state layout (node-0 rows/cols zero)
    f = jnp.asarray(forgetting, dtype)
    Hp_full = jnp.zeros((DX, DX), dtype).at[NODE_DOF:, NODE_DOF:].set(
        0.5 * (Hp + Hp.T) * f
    )
    gp_full = jnp.zeros(DX, dtype).at[NODE_DOF:].set(gp * f)

    return Prior(
        H=Hp_full,
        g=gp_full,
        lin_nodes=window.nodes,
        lin_ext_p=window.ext_p,
        lin_ext_q=window.ext_q,
        lin_td=window.td,
        lin_sodo=window.sodo,
    )


def slide_window(window: Window, prior: Prior) -> tuple[Window, Prior]:
    """Roll everything left by one node; clear the freed slots; remap the
    prior's columns and linearization snapshot."""
    N, L = window.n_nodes, window.n_landmarks
    DX = window.dim_x
    dtype = window.nodes.p.dtype

    roll1 = lambda x: jnp.roll(x, -1, axis=0)
    nodes = jax.tree.map(roll1, window.nodes)
    node_valid = roll1(window.node_valid).at[-1].set(False)
    node_is_kf = roll1(window.node_is_kf).at[-1].set(False)
    preint = jax.tree.map(roll1, window.preint)
    preint_valid = roll1(window.preint_valid).at[-1].set(False)
    gnss_p = roll1(window.gnss_p)
    gnss_std = roll1(window.gnss_std)
    gnss_std_base = roll1(window.gnss_std_base)
    gnss_valid = roll1(window.gnss_valid).at[-1].set(False)
    frame_td = roll1(window.frame_td)

    obs_uv = jnp.roll(window.obs_uv, -1, axis=1).at[:, -1].set(0.0)
    obs_vel = jnp.roll(window.obs_vel, -1, axis=1).at[:, -1].set(0.0)
    obs_valid = jnp.roll(window.obs_valid, -1, axis=1).at[:, -1].set(False)

    lm_dead = (window.lm_ref == 0) & window.lm_valid
    lm_valid = window.lm_valid & ~lm_dead
    lm_ref = jnp.maximum(window.lm_ref - 1, 0)

    win = window._replace(
        nodes=nodes, node_valid=node_valid, node_is_kf=node_is_kf,
        preint=preint, preint_valid=preint_valid,
        gnss_p=gnss_p, gnss_std=gnss_std, gnss_std_base=gnss_std_base,
        gnss_valid=gnss_valid,
        frame_td=frame_td,
        obs_uv=obs_uv, obs_vel=obs_vel, obs_valid=obs_valid,
        lm_valid=lm_valid, lm_ref=lm_ref,
    )

    # Roll the prior's node block: node i <- node i+1; ext/td stay; the
    # freed last-node dims become zero. H rolls symmetrically (rows+cols),
    # g rolls once; the lin snapshot rolls with the window.
    def roll_dx(x):
        node = x[..., : N * NODE_DOF].reshape(x.shape[:-1] + (N, NODE_DOF))
        node = jnp.roll(node, -1, axis=-2).at[..., -1, :].set(0.0)
        return jnp.concatenate(
            [node.reshape(x.shape[:-1] + (N * NODE_DOF,)),
             x[..., N * NODE_DOF :]], axis=-1)

    H_new = roll_dx(roll_dx(prior.H).T).T
    lin_nodes = jax.tree.map(roll1, prior.lin_nodes)
    pr = Prior(
        H=H_new, g=roll_dx(prior.g),
        lin_nodes=lin_nodes,
        lin_ext_p=prior.lin_ext_p, lin_ext_q=prior.lin_ext_q,
        lin_td=prior.lin_td, lin_sodo=prior.lin_sodo,
    )
    return win, pr


def marginalize_and_slide(window: Window, prior: Prior, cfg, params,
                          forgetting: float = 1.0):
    """Full marginalization round: build the new prior, then slide."""
    new_prior = marginalize_node0(window, prior, cfg, params, forgetting)
    return slide_window(window, new_prior)


def remove_node(window: Window, prior: Prior, i: int,
                n_active: int) -> tuple[Window, Prior]:
    """Drop interior/tail time node ``i`` (host index < ``n_active``),
    shifting the nodes above it down one slot.

    Capability parity with the second-new-keyframe removal
    (``gvinsRemoveAllSecondNewFrame``, ic_gvins.cc:1425-1445) plus the
    time-node merge (``removeUnusedTimeNode``, ic_gvins.cc:788-823). The
    preintegration slot layout after removal leaves slot ``i-1`` spanning
    the merged interval node ``i-1`` -> old node ``i+1``; the caller (who
    owns the IMU buffer) must re-preintegrate that span and overwrite the
    slot — the reference merges the raw IMU buffers and reintegrates the
    same way. Landmarks anchored at node ``i`` are invalidated (their
    reference frame is gone, map.cc:89-125 semantics); later anchors shift
    down. The prior's node-``i`` columns are dropped — by construction the
    prior only has support near node 0 while removal targets fresh frames.
    """
    assert 0 < i < n_active

    def drop(x):
        # pad with the stale last entry, NOT zeros: freed slots are masked
        # but still *evaluated* in the fixed-shape factor kernels, and a
        # zero quaternion / zero covariance would NaN through the mask
        # (same reason slide_window rolls instead of clearing)
        return jnp.concatenate([x[:i], x[i + 1 :], x[-1:]], 0)

    nodes = jax.tree.map(drop, window.nodes)
    # preintervals: slot k joins node k -> k+1. Removing node i kills the
    # interval starting at i (or, for the tail node, the one ending at i).
    j = i if i < n_active - 1 else i - 1

    def drop_pre(x):
        return jnp.concatenate([x[:j], x[j + 1 :], x[-1:]], 0)

    preint = jax.tree.map(drop_pre, window.preint)
    preint_valid = drop_pre(window.preint_valid).at[-1].set(False)
    if i >= n_active - 1:
        preint_valid = preint_valid.at[i - 1].set(False)

    obs_uv = jnp.concatenate(
        [window.obs_uv[:, :i], window.obs_uv[:, i + 1 :],
         jnp.zeros_like(window.obs_uv[:, :1])], 1)
    obs_vel = jnp.concatenate(
        [window.obs_vel[:, :i], window.obs_vel[:, i + 1 :],
         jnp.zeros_like(window.obs_vel[:, :1])], 1)
    obs_valid = jnp.concatenate(
        [window.obs_valid[:, :i], window.obs_valid[:, i + 1 :],
         jnp.zeros_like(window.obs_valid[:, :1])], 1)

    lm_dead = (window.lm_ref == i) & window.lm_valid
    lm_valid = window.lm_valid & ~lm_dead
    lm_ref = jnp.where(window.lm_ref > i, window.lm_ref - 1, window.lm_ref)
    obs_valid = obs_valid & ~lm_dead[:, None]

    win = window._replace(
        nodes=nodes,
        node_valid=drop(window.node_valid).at[-1].set(False),
        node_is_kf=drop(window.node_is_kf).at[-1].set(False),
        preint=preint, preint_valid=preint_valid,
        gnss_p=drop(window.gnss_p), gnss_std=drop(window.gnss_std),
        gnss_std_base=drop(window.gnss_std_base),
        gnss_valid=drop(window.gnss_valid).at[-1].set(False),
        frame_td=drop(window.frame_td),
        obs_uv=obs_uv, obs_vel=obs_vel, obs_valid=obs_valid,
        lm_valid=lm_valid, lm_ref=lm_ref,
    )

    N = window.n_nodes

    def drop_dx(x):
        node = x[..., : N * NODE_DOF].reshape(x.shape[:-1] + (N, NODE_DOF))
        node = jnp.concatenate(
            [node[..., :i, :], node[..., i + 1 :, :],
             jnp.zeros_like(node[..., :1, :])], axis=-2)
        return jnp.concatenate(
            [node.reshape(x.shape[:-1] + (N * NODE_DOF,)),
             x[..., N * NODE_DOF :]], axis=-1)

    pr = prior._replace(
        H=drop_dx(drop_dx(prior.H).T).T, g=drop_dx(prior.g),
        lin_nodes=jax.tree.map(drop, prior.lin_nodes),
    )
    return win, pr


def insert_node(window: Window, prior: Prior, i: int,
                n_active: int) -> tuple[Window, Prior]:
    """Open a free slot at node index ``i`` (0 < i <= n_active < capacity),
    shifting nodes i.. up by one — the window-tail rebuild of
    ``insertNewGnssTimeNode`` (ic_gvins.cc:894-920: pop the tail, add the
    GNSS node, re-add the tail) done as one shift.

    The caller must then fill the slot: node state, gnss fields, and the
    two preintegrations around it (slots ``i-1`` and ``i`` both span stale
    intervals after the shift). Landmark anchors at/after ``i`` move up;
    observation columns shift with their nodes. The freed duplicate slot
    content is stale-but-finite (masked by the validity flags)."""
    assert 0 < i <= n_active < window.n_nodes

    def ins(x):
        # duplicate entry i-1 into the new slot: finite placeholder values
        # (quaternions stay normalized); the tail entry falls off
        return jnp.concatenate([x[:i], x[i - 1 : i], x[i:-1]], 0)

    nodes = jax.tree.map(ins, window.nodes)

    def ins_pre(x):
        return jnp.concatenate(
            [x[: i - 1], x[i - 2 : i - 1] if i >= 2 else x[:1], x[i - 1 : -1]],
            0,
        )

    preint = jax.tree.map(ins_pre, window.preint)
    # both halves of the split interval need re-preintegration by the
    # caller; mark the first half invalid until then
    preint_valid = ins_pre(window.preint_valid).at[i - 1].set(False)
    preint_valid = preint_valid.at[i].set(False)

    obs_uv = jnp.concatenate(
        [window.obs_uv[:, :i], jnp.zeros_like(window.obs_uv[:, :1]),
         window.obs_uv[:, i:-1]], 1)
    obs_vel = jnp.concatenate(
        [window.obs_vel[:, :i], jnp.zeros_like(window.obs_vel[:, :1]),
         window.obs_vel[:, i:-1]], 1)
    obs_valid = jnp.concatenate(
        [window.obs_valid[:, :i], jnp.zeros_like(window.obs_valid[:, :1]),
         window.obs_valid[:, i:-1]], 1)

    lm_ref = jnp.where(window.lm_ref >= i, window.lm_ref + 1, window.lm_ref)

    win = window._replace(
        nodes=nodes,
        node_valid=ins(window.node_valid).at[i].set(True),
        node_is_kf=ins(window.node_is_kf).at[i].set(False),
        preint=preint, preint_valid=preint_valid,
        gnss_p=ins(window.gnss_p), gnss_std=ins(window.gnss_std),
        gnss_std_base=ins(window.gnss_std_base),
        gnss_valid=ins(window.gnss_valid).at[i].set(False),
        frame_td=ins(window.frame_td),
        obs_uv=obs_uv, obs_vel=obs_vel, obs_valid=obs_valid,
        lm_ref=lm_ref,
    )

    N = window.n_nodes

    def ins_dx(x):
        node = x[..., : N * NODE_DOF].reshape(x.shape[:-1] + (N, NODE_DOF))
        node = jnp.concatenate(
            [node[..., :i, :], jnp.zeros_like(node[..., :1, :]),
             node[..., i:-1, :]], axis=-2)
        return jnp.concatenate(
            [node.reshape(x.shape[:-1] + (N * NODE_DOF,)),
             x[..., N * NODE_DOF :]], axis=-1)

    pr = prior._replace(
        H=ins_dx(ins_dx(prior.H).T).T, g=ins_dx(prior.g),
        lin_nodes=jax.tree.map(ins, prior.lin_nodes),
    )
    return win, pr
