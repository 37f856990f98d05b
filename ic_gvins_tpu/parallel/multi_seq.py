"""Multi-sequence data-parallel bundle adjustment.

Batch many independent sliding windows (different sequences / different
time segments) and optimize them simultaneously: ``jax.vmap`` over the
window pytree turns every factor evaluation and linear solve into a batched
XLA op (MXU-friendly), and sharding the batch axis over a device mesh gives
multi-chip/multi-host data parallelism with zero communication — the
throughput story for offline/replay processing (the reference is strictly
single-sequence, single-process; this capability is new).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.types import IntegrationParams
from ..solver import lm as lm_mod
from ..solver.window import Prior, SolverConfig, Window


@partial(jax.jit, static_argnames=("iters",))
def optimize_batch(
    windows: Window,  # leading batch axis on every leaf
    priors: Prior,
    cfg: SolverConfig,  # shared (unbatched)
    params: IntegrationParams,  # shared
    iters: int = 20,
):
    """vmapped two-phase optimization over a batch of windows."""

    def one(win, pr):
        out, (s1, s2, ncull) = lm_mod.optimize.__wrapped__(win, pr, cfg, params, iters=iters)
        return out, (s1.cost0, s2.cost1, ncull,
                     s1.iters_run + s2.iters_run, s1.accepted + s2.accepted)

    return jax.vmap(one)(windows, priors)


def shard_batch(windows: Window, priors: Prior, mesh: Mesh, axis: str = "dp"):
    """Place the batch axis of (windows, priors) across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    put = lambda x: jax.device_put(x, sh)
    return jax.tree.map(put, windows), jax.tree.map(put, priors)


def stack_windows(wins: list[Window]) -> Window:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *wins)


def stack_priors(prs: list[Prior]) -> Prior:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *prs)
