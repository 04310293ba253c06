"""Probe: single-row dynamic VMEM read/write at arbitrary (non-8-aligned)
row offsets — i32 and bf16."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_kernel(x_ref, o_ref, scr):
    # write rows 0..63 of scratch at dynamic offsets via fori
    def wbody(i, _):
        scr[pl.ds(i, 1), :] = x_ref[pl.ds(i, 1), :] + i
        return 0

    jax.lax.fori_loop(0, 64, wbody, 0)

    def rbody(i, _):
        o_ref[pl.ds(i, 1), :] = scr[pl.ds(63 - i, 1), :]
        return 0

    jax.lax.fori_loop(0, 64, rbody, 0)


def probe(x):
    return pl.pallas_call(
        probe_kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), x.dtype)],
    )(x)


rng = np.random.default_rng(0)
x = rng.integers(0, 1000, (64, 128)).astype(np.int32)
got = np.asarray(probe(jnp.asarray(x)))
want = np.stack([x[63 - i] + (63 - i) for i in range(64)])
print("i32 single-row dynamic rw:", "OK" if (got == want).all() else
      f"BROKEN ndiff={int((got != want).sum())}", flush=True)

xb = (rng.integers(0, 255, (64, 128)).astype(np.float32)).astype(np.float32)


def probe_kernel_b(x_ref, o_ref, scr):
    def wbody(i, _):
        scr[pl.ds(i, 1), :] = x_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, 64, wbody, 0)

    def rbody(i, _):
        o_ref[pl.ds(i, 1), :] = scr[pl.ds(63 - i, 1), :]
        return 0

    jax.lax.fori_loop(0, 64, rbody, 0)


def probe_b(x):
    return pl.pallas_call(
        probe_kernel_b,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.bfloat16)],
    )(x)


gotb = np.asarray(probe_b(jnp.asarray(xb, jnp.bfloat16))).astype(np.float32)
wantb = np.stack([xb[63 - i] for i in range(64)])
print("bf16 single-row dynamic rw:", "OK" if (gotb == wantb).all() else
      f"BROKEN ndiff={int((gotb != wantb).sum())}", flush=True)

# read-modify-write with where (the queue append pattern)
def rmw_kernel(x_ref, o_ref, scr):
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        old = scr[pl.ds(i & 63, 1), :]
        scr[pl.ds(i & 63, 1), :] = jnp.where(iota1 < 64, x_ref[pl.ds(i & 63, 1), :] * 2,
                                             old)
        return 0

    scr[:, :] = x_ref[:, :]
    jax.lax.fori_loop(0, 64, body, 0)
    o_ref[:, :] = scr[:, :]


def rmw(x):
    return pl.pallas_call(
        rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.int32)],
    )(x)


got2 = np.asarray(rmw(jnp.asarray(x)))
want2 = x.copy()
want2[:, :64] *= 2
print("i32 RMW where:", "OK" if (got2 == want2).all() else
      f"BROKEN ndiff={int((got2 != want2).sum())}", flush=True)
print("done")
