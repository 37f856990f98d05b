#!/usr/bin/env python
"""Micro-bench of the LM round's pieces on the real chip: assemble vs
Schur solve vs cost probe vs full iteration, batch 8 at bench shapes.
Uses the scanned-repetition harness (tunnel RTT excluded).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
N_NODES = 12
N_LANDMARKS = 192


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from __graft_entry__ import _tiny_problem
    from ic_gvins_tpu.solver import assembly as asm
    from ic_gvins_tpu.solver import lm as lm_mod

    dtype = jnp.float32
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = None
    import contextlib

    ctx = jax.default_device(cpu0) if cpu0 is not None else contextlib.nullcontext()
    with ctx:
        w, p, cfg, params = _tiny_problem(
            n_nodes=N_NODES, n_landmarks=N_LANDMARKS, dtype=dtype, seed=0
        )
    dev = jax.devices()[0]
    w, p, cfg, params = jax.device_put((w, p, cfg, params), dev)
    tile = lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape)
    bw = jax.tree.map(tile, w)
    bp = jax.tree.map(tile, p)
    flags = asm.RobustFlags(jnp.asarray(True), jnp.asarray(True))

    @jax.jit
    def f_assemble(bw, bp):
        return jax.vmap(
            lambda wi, pi: asm.assemble_blocks(wi, pi, cfg, params, flags)
        )(bw, bp)

    @jax.jit
    def f_solve(blocks):
        Hxx, gx, Hxl, hll, gl, _ = blocks
        return jax.vmap(
            lambda a, b, c, d, e: asm.schur_solve_blocks(a, b, c, d, e, 1e-4)
        )(Hxx, gx, Hxl, hll, gl)

    @jax.jit
    def f_cost(bw, bp):
        return jax.vmap(
            lambda wi, pi: asm.robust_cost(wi, pi, cfg, params, flags)
        )(bw, bp)

    @jax.jit
    def f_iter1(bw, bp):
        def one(wi, pi):
            out, stats = lm_mod.lm_run(wi, pi, cfg, params, flags, 1)
            return out.nodes.p, stats.cost1
        return jax.vmap(one)(bw, bp)

    @jax.jit
    def f_evalreproj(bw):
        return jax.vmap(lambda wi: asm.eval_reproj(wi, cfg))(bw)

    @jax.jit
    def f_evalpreint(bw):
        return jax.vmap(lambda wi: asm.eval_preint(wi, params))(bw)

    blocks = f_assemble(bw, bp)
    jax.block_until_ready(blocks[0])
    print(f"eval_reproj   : {timed(f_evalreproj, bw):7.2f} ms")
    print(f"eval_preint   : {timed(f_evalpreint, bw):7.2f} ms")
    print(f"assemble      : {timed(f_assemble, bw, bp):7.2f} ms")
    print(f"schur solve   : {timed(f_solve, blocks):7.2f} ms")
    print(f"cost probe    : {timed(f_cost, bw, bp):7.2f} ms")
    print(f"1 LM iteration: {timed(f_iter1, bw, bp):7.2f} ms")


if __name__ == "__main__":
    main()
