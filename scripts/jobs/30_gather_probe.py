"""Probe Mosaic/Pallas gather primitives on the real TPU (round 3).

Everything in the decode redesign hinges on whether per-lane VMEM gathers
exist and how fast they run. Tests:
  1. take_along_axis along lanes, 128-entry shared table
  2. take_along_axis along lanes, wider tables (256..4096)
  3. take_along_axis along sublanes of (N, 128)
  4. big-buffer gather formulations
Each timed over many iterations inside one kernel invocation.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 64, 1024          # index block: 64 rows x 1024 lanes = 64k lookups
ITERS = 50


def timeit(fn, *args):
    fn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    r = fn(*args)
    r[0].block_until_ready()
    t1 = time.perf_counter()
    return (t1 - t0), r


def try_case(name, build):
    try:
        fn, args = build()
        dt, r = timeit(fn, *args)
        n = R * L * ITERS
        print(f"{name}: {dt*1e3:.2f} ms total, {n/dt/1e9:.2f} G lookups/s")
        return r
    except Exception as e:
        msg = str(e).split(chr(10))[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


# ---- case 1: lane gather, table broadcast to every row ----
def case_lane128():
    T = 128

    def kernel(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[0:1, :], (R, L))
        def body(i, acc):
            idx = (idx_ref[:, :] + acc) & (T - 1)
            # gather within each row of `tab`? tab row is 1024 wide but table
            # is 128 entries replicated 8x -> mask idx to 128 and rely on
            # lane-local gather across the full 1024 row
            g = jnp.take_along_axis(tab, idx, axis=1)
            return acc + g
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, L), jnp.int32))

    tab = jnp.tile(jnp.arange(128, dtype=jnp.int32), 8)[None, :]
    idx = jnp.asarray(np.random.randint(0, T, (R, L)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


# ---- case 2: lane gather, full-width 1024 table ----
def case_lane_full():
    def kernel(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[0:1, :], (R, L))
        def body(i, acc):
            idx = (idx_ref[:, :] + acc) & (L - 1)
            g = jnp.take_along_axis(tab, idx, axis=1)
            return acc + g
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, L), jnp.int32))

    tab = jnp.arange(L, dtype=jnp.int32)[None, :]
    idx = jnp.asarray(np.random.randint(0, L, (R, L)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


# ---- case 3: sublane gather of (256,128) with (8,128) idx ----
def case_sublane():
    N = 256

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = (idx_ref[:, :] + acc) % N
            g = jnp.take_along_axis(tab_ref[:, :], idx, axis=0)  # (R,128)
            return acc + g
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, 128), jnp.int32))

    tab = jnp.asarray(np.random.randint(0, 1000, (N, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, N, (R, 128)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


# ---- case 4: flat big-table gather via jnp.take (1D semantics) ----
def case_take_flat():
    T = 32768

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:, :].reshape(-1)
        def body(i, acc):
            idx = (idx_ref[:, :] + acc) & (T - 1)
            g = jnp.take(tab, idx, axis=0)
            return acc + g
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, L), jnp.int32))

    tab = jnp.asarray(np.random.randint(0, 1000, (T // 128, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R, L)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


# ---- case 5: XLA take_along_axis on device (no pallas), 32k table ----
def case_xla_gather():
    T = 32768

    @jax.jit
    def fn(tab, idx):
        def body(i, acc):
            g = tab[(idx + acc) & (T - 1)]
            return acc + g
        return (jax.lax.fori_loop(0, ITERS, body,
                                  jnp.zeros(idx.shape, jnp.int32)),)

    tab = jnp.asarray(np.random.randint(0, 1000, (T,)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R * L,)), jnp.int32)
    return fn, (tab, idx)


# ---- case 6: XLA gather from big buffer (8M) ----
def case_xla_big():
    T = 1 << 23

    @jax.jit
    def fn(tab, idx):
        def body(i, acc):
            g = tab[(idx + acc) & (T - 1)]
            return acc + g
        return (jax.lax.fori_loop(0, ITERS, body,
                                  jnp.zeros(idx.shape, jnp.int32)),)

    tab = jnp.asarray(np.random.randint(0, 1000, (T,)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R * L,)), jnp.int32)
    return fn, (tab, idx)


# ---- case 7: sublane gather tall (2048,128) ----
def case_sublane_tall():
    N = 2048

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = (idx_ref[:, :] + acc) % N
            g = jnp.take_along_axis(tab_ref[:, :], idx, axis=0)
            return acc + g
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, 128), jnp.int32))

    tab = jnp.asarray(np.random.randint(0, 1000, (N, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, N, (R, 128)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


# ---- case 8: uint8 lane gather ----
def case_lane_u8():
    def kernel(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[0:1, :], (R, L))
        def body(i, acc):
            idx = ((idx_ref[:, :].astype(jnp.int32) + acc) & (L - 1))
            g = jnp.take_along_axis(tab, idx.astype(jnp.uint8).astype(jnp.int32) % L, axis=1)
            return acc + g.astype(jnp.int32)
        out_ref[:, :] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, L), jnp.int32))

    tab = jnp.asarray(np.random.randint(0, 255, (1, L)), jnp.uint8)
    idx = jnp.asarray(np.random.randint(0, L, (R, L)), jnp.int32)
    fn = jax.jit(lambda t, i: (pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i),))
    return fn, (tab, idx)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    r1 = try_case("1 lane-gather 128-table", case_lane128)
    r2 = try_case("2 lane-gather 1024-table", case_lane_full)
    r3 = try_case("3 sublane-gather (256,128)", case_sublane)
    r7 = try_case("7 sublane-gather (2048,128)", case_sublane_tall)
    r4 = try_case("4 flat take 32k", case_take_flat)
    r8 = try_case("8 lane-gather u8", case_lane_u8)
    r5 = try_case("5 XLA gather 32k-table", case_xla_gather)
    r6 = try_case("6 XLA gather 8M-buffer", case_xla_big)
