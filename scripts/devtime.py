"""Device-time measurement via distinct input cycling.

truetime.measure's salt trick fails when a stage's inputs cannot be
perturbed without changing semantics (the compiler hoists the loop-invariant
stage). This harness pre-builds N genuinely distinct input sets, cycles
through them with a traced selector inside one fori_loop program, and
consumes a reduction of every output — nothing is loop-invariant, nothing
can be deduplicated, and one scalar readback forces completion.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def measure_cycled(input_sets, stage, iters: int = 8, reduce_out=None):
    """Time `stage(*inputs)` with inputs cycling over `input_sets` (a list of
    >= 2 input tuples of identically-shaped device arrays). Returns seconds
    per iteration, overhead-corrected."""
    n_sets = len(input_sets)
    assert n_sets >= 2
    stacked = [jnp.stack([s[i] for s in input_sets])
               for i in range(len(input_sets[0]))]

    if reduce_out is None:
        def reduce_out(out):
            acc = jnp.uint32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc ^ jnp.sum(
                    leaf.astype(jnp.uint32) if leaf.dtype != jnp.uint32
                    else leaf, dtype=jnp.uint32)
            return acc

    @functools.partial(jax.jit, static_argnames=("n", "run_stage"))
    def loop(salt0, n, run_stage):
        def body(k, acc):
            sel = (salt0 + k) % n_sets
            inp = tuple(jax.lax.dynamic_index_in_dim(s, sel, keepdims=False)
                        for s in stacked)
            if run_stage:
                return acc ^ reduce_out(stage(*inp))
            acc2 = jnp.uint32(0)
            for leaf in inp:
                acc2 = acc2 ^ leaf.reshape(-1)[0].astype(jnp.uint32)
            return acc ^ acc2
        return jax.lax.fori_loop(0, n, body, salt0.astype(jnp.uint32))

    def run(n, run_stage):
        t0 = time.perf_counter()
        int(loop(jnp.int32(n * 3 + run_stage), n, run_stage)[...])
        return time.perf_counter() - t0

    run(iters, True)
    run(iters, False)
    tb = run(iters, False)
    ts = run(iters, True)
    return max(ts - tb, 1e-9) / iters
