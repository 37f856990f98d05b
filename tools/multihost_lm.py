#!/usr/bin/env python
"""Multi-process (multi-host stand-in) landmark-sharded LM worker.

Spawned by tests/test_multihost.py: N processes x K virtual CPU devices
each join one jax.distributed cluster; the global mesh's "lm" axis then
CROSSES PROCESS BOUNDARIES, so the psum reductions of
``parallel/lm_sharded.optimize_sharded`` ride the distributed backend
(gRPC here; DCN on a real multi-host TPU pod — SURVEY §5.8's story).

Each process builds the identical problem, shards the landmark axis over
the global mesh, runs the REAL two-phase LM round, and process 0 compares
the result against the single-process path bit-for-bit at f64 tolerance.

Usage (as spawned by the test):
    python tools/multihost_lm.py --coord 127.0.0.1:PORT --nproc 2 --pid 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=args.coord,
        num_processes=args.nproc,
        process_id=args.pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_problem
    from ic_gvins_tpu.parallel import lm_sharded
    from ic_gvins_tpu.solver import lm as lm_mod

    n_global = args.nproc * args.local_devices
    # every process builds the IDENTICAL problem (deterministic seed)
    win, prior, cfg, params = _tiny_problem(
        n_nodes=6, n_landmarks=n_global * 4, seed=7
    )

    mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("lm",))
    w_spec = lm_sharded.window_pspec(win)

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        # global array from per-process replicas of the full value
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: np.asarray(x)[idx]
        )

    win_g = jax.tree.map(put, win, w_spec)
    repl = jax.tree.map(lambda _: P(), prior)
    prior_g = jax.tree.map(put, prior, repl)
    cfg_g = jax.tree.map(put, cfg, jax.tree.map(lambda _: P(), cfg))
    params_g = jax.tree.map(put, params, jax.tree.map(lambda _: P(), params))

    out, (s1, s2, ncull) = lm_sharded.optimize_sharded(
        win_g, prior_g, cfg_g, params_g, mesh, iters=8
    )

    # node states / stats come out REPLICATED (every device holds the full
    # value): read the local replica and compare on every process against
    # the single-process algorithm on the same problem
    nodes_p = np.asarray(out.nodes.p.addressable_data(0))
    cost1 = float(np.asarray(s2.cost1.addressable_data(0)))

    ref, (r1, r2, rncull) = lm_mod.optimize(win, prior, cfg, params, iters=8)
    err = float(np.max(np.abs(nodes_p - np.asarray(ref.nodes.p))))
    ok = err < 1e-8 and np.isfinite(cost1)
    if args.pid == 0:
        print(json.dumps(dict(
            ok=bool(ok),
            max_node_p_err=err,
            cost1_sharded=cost1,
            cost1_single=float(r2.cost1),
            n_processes=args.nproc,
            n_global_devices=n_global,
        )), flush=True)
    jax.distributed.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
