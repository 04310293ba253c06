#!/usr/bin/env python
"""Trustworthy TPU stage timing on the axon backend.

Known backend hazards this harness is built around (measured, 2026-08-18):
  * block_until_ready does not reliably force completion — identical
    re-executions appear ~free; only a device->host scalar readback is a
    hard sync.
  * The FIRST d2h permanently drops the process into synchronous
    per-dispatch mode (~25-50 ms/dispatch), so: one fori_loop program per
    measurement, one readback, fresh process per experiment when comparing.
  * Eagerly-created jnp constants captured in traces force a d2h at
    lowering (same poison) — keep trace constants numpy.

Method: run the stage inside fori_loop(iters) with a salt that perturbs the
input (defeats any result dedup) and an accumulator that consumes a cheap
but non-prunable reduction of the stage output; read ONE scalar. The empty
loop with the same structure calibrates overhead.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def measure(make_inputs, stage, iters: int = 8, reduce_out=None, warm: bool = True):
    """Time `stage` (callable on device inputs) forced-complete.

    make_inputs(salt:int32 tracer) -> pytree of stage inputs, built inside
    the measured program from closed-over device arrays + salt (so every
    iteration differs). reduce_out(out)->u32 scalar must depend on the
    bulk of the output (default: xor-sum of every leaf).
    Returns seconds per iteration (overhead-corrected).
    """
    if reduce_out is None:
        def reduce_out(out):
            acc = jnp.uint32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc ^ jnp.sum(
                    leaf.astype(jnp.uint32) if leaf.dtype != jnp.uint32 else leaf,
                    dtype=jnp.uint32)
            return acc

    @functools.partial(jax.jit, static_argnames=("n", "run_stage"))
    def loop(salt0, n, run_stage):
        def body(k, acc):
            inp = make_inputs(salt0 + k)
            if run_stage:
                out = stage(*inp) if isinstance(inp, tuple) else stage(inp)
                return acc ^ reduce_out(out)
            else:
                acc2 = jnp.uint32(0)
                for leaf in jax.tree_util.tree_leaves(inp):
                    acc2 = acc2 ^ leaf.reshape(-1)[0].astype(jnp.uint32)
                return acc ^ acc2
        return jax.lax.fori_loop(0, n, body, salt0.astype(jnp.uint32))

    def run(n, run_stage):
        t0 = time.perf_counter()
        int(loop(jnp.int32(n * 7 + run_stage), n, run_stage)[...])
        return time.perf_counter() - t0

    if warm:
        # warm with the SAME static loop length: a different `n` is a new
        # program and its (remote, slow) compile would land inside the timing
        run(iters, True)
        run(iters, False)
    tb = run(iters, False)
    ts = run(iters, True)
    return max(ts - tb, 1e-9) / iters
