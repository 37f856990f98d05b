"""Landmark-sharded two-phase LM: the engine's REAL optimization round on a
device mesh.

Unlike a one-shot GN step, this runs the complete algorithm of
``solver/lm.py`` — accept/reject trust-region damping, Ceres-parity early
termination, between-phase chi2 culling — under ``shard_map`` with the
landmark dimension sharded over the mesh axis ``"lm"``:

* every device evaluates its landmark shard's reprojection factors and
  contributes to the reduced camera system via ``psum`` (ICI within a
  slice, DCN across hosts),
* the tiny reduced solve and all accept/reject decisions are replicated —
  bitwise identical control flow on every device,
* landmark back-substitution and chi2 observation culling stay local.

Numerically this is the SAME algorithm as the single-device
``lm.optimize`` (only the floating-point reduction order over landmark
partial sums differs), replacing Ceres DENSE_SCHUR + 4 threads
(``ic_gvins.cc:1178-1180``) with XLA collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..data.types import IntegrationParams
from ..solver.lm import LMStats, optimize_impl
from ..solver.window import Prior, SolverConfig, Window

AXIS = "lm"


def window_pspec(window: Window, axis: str = AXIS) -> Window:
    """PartitionSpec pytree: landmark-indexed arrays sharded, rest replicated."""
    return Window(
        nodes=jax.tree.map(lambda _: P(), window.nodes),
        node_valid=P(), node_is_kf=P(),
        preint=jax.tree.map(lambda _: P(), window.preint),
        preint_valid=P(),
        gnss_p=P(), gnss_std=P(), gnss_std_base=P(), gnss_valid=P(),
        ext_p=P(), ext_q=P(), td=P(), sodo=P(), frame_td=P(),
        lm_invdepth=P(axis), lm_ref=P(axis), lm_valid=P(axis),
        obs_uv=P(axis), obs_vel=P(axis), obs_valid=P(axis),
    )


@partial(jax.jit, static_argnames=("mesh", "iters", "do_cull"))
def optimize_sharded(
    window: Window,
    prior: Prior,
    cfg: SolverConfig,
    params: IntegrationParams,
    mesh: Mesh,
    iters: int = 20,
    do_cull: bool = True,
):
    """Two-phase round with landmarks sharded over ``mesh`` axis "lm".

    The landmark capacity must divide the mesh size. Returns the same
    ``(window, (stats1, stats2, n_culled))`` as ``lm.optimize``.
    """
    if window.n_landmarks % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"landmark capacity {window.n_landmarks} must divide the mesh "
            f"size {mesh.shape[AXIS]}"
        )
    w_spec = window_pspec(window)
    repl = P()
    repl_prior = jax.tree.map(lambda _: repl, prior)
    repl_cfg = jax.tree.map(lambda _: repl, cfg)
    repl_params = jax.tree.map(lambda _: repl, params)
    stats_spec = jax.tree.map(lambda _: repl, LMStats(*([jnp.zeros(())] * 5)))

    def inner(win, prior_, cfg_, params_):
        return optimize_impl(win, prior_, cfg_, params_, iters, do_cull,
                             axis_name=AXIS)

    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(w_spec, repl_prior, repl_cfg, repl_params),
        out_specs=(w_spec, (stats_spec, stats_spec, repl)),
        check_vma=False,
    )
    return fn(window, prior, cfg, params)
