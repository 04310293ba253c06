"""Microcosts: dynamic single-row VMEM writes, RMW, lax.cond / while
structural overhead inside Pallas on v5e."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from devtime import measure_cycled
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
N = 16384


def timeit(name, sets, fn, iters=8, per=None):
    try:
        t = measure_cycled(sets, fn, iters=iters)
        extra = f"  ({t / per * 1e9:.0f} ns/op)" if per else ""
        print(f"{name}: {t * 1e3:.3f} ms{extra}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)


def mk(kernel, scratch_rows=64):
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((scratch_rows, 128), jnp.int32)],
        )(x)
    return run


sets = [(jnp.asarray(rng.integers(0, 1 << 20, (N // 128, 128)), jnp.int32),)
        for _ in range(2)]


def w1(x_ref, o_ref, scr):
    v = x_ref[0:1, :]

    def body(i, c):
        scr[pl.ds(i & 63, 1), :] = v + i
        return c + 1

    jax.lax.fori_loop(0, N, body, jnp.int32(0))
    o_ref[...] = scr[0:8, :]


timeit(f"W1 dyn 1-row write x{N}", sets, mk(w1), per=N)


def w2(x_ref, o_ref, scr):
    v = x_ref[0:1, :]
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, c):
        old = scr[pl.ds(i & 63, 1), :]
        scr[pl.ds(i & 63, 1), :] = jnp.where(iota1 < (i & 127), v + i, old)
        return c + 1

    jax.lax.fori_loop(0, N, body, jnp.int32(0))
    o_ref[...] = scr[0:8, :]


timeit(f"W2 dyn 1-row RMW x{N}", sets, mk(w2), per=N)


def w3(x_ref, o_ref, scr):
    def body(i, c):
        return jax.lax.cond(i & 1, lambda a: a + 1, lambda a: a, c)

    r = jax.lax.fori_loop(0, N, body, jnp.int32(0))
    o_ref[...] = jnp.full((8, 128), r, jnp.int32)


timeit(f"W3 trivial cond x{N}", sets, mk(w3), per=N)


def w4(x_ref, o_ref, scr):
    big = x_ref[:, :] * 2   # live vector across conds

    def body(i, c):
        def then(a):
            def wc(cc):
                return cc < i

            def wb(cc):
                return cc + (1 << 20)

            return jax.lax.while_loop(wc, wb, a)

        return jax.lax.cond(i & 1, then, lambda a: a, c)

    r = jax.lax.fori_loop(0, N // 8, body, jnp.int32(1 << 22))
    o_ref[...] = big[0:8, :] + r


timeit(f"W4 cond+while x{N // 8}", sets, mk(w4), per=N // 8)


def w5(x_ref, o_ref, scr):
    vals = [x_ref[i:i + 1, :] for i in range(8)]
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, c):
        def then(cc):
            for f in range(5):
                r0 = (cc >> 7) & 31
                old = scr[pl.ds(f * 32 + r0, 1), :]
                scr[pl.ds(f * 32 + r0, 1), :] = jnp.where(
                    iota1 < (cc & 127), vals[f] + i, old)
            return cc + 3

        return jax.lax.cond(i & 1, then, lambda cc: cc, c)

    r = jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))
    o_ref[...] = jnp.full((8, 128), r, jnp.int32)


timeit(f"W5 cond+5xRMW x{N // 8}", sets, mk(w5, 160), per=N // 8)

# W6: the real append pattern: 16 sequential conds per "tile" over vector
# state kept live (like cf rows)
def w6(x_ref, o_ref, scr):
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    cf = x_ref[:, :]   # (128,128) live

    def tile(t, c):
        for r in range(16):
            def then(cc):
                row = cf[r:r + 1, :]
                for f in range(5):
                    r0 = (cc >> 7) & 31
                    old = scr[pl.ds(f * 32 + r0, 1), :]
                    scr[pl.ds(f * 32 + r0, 1), :] = jnp.where(
                        iota1 < (cc & 127), row, old)
                return cc + 3

            c = jax.lax.cond((t + r) & 1, then, lambda cc: cc, c)
        return c

    r = jax.lax.fori_loop(0, 128, tile, jnp.int32(0))
    o_ref[...] = jnp.full((8, 128), r, jnp.int32)


sets2 = [(jnp.asarray(rng.integers(0, 1 << 20, (128, 128)), jnp.int32),)
         for _ in range(2)]
timeit("W6 128 tiles x 16 cond-appends", sets2, mk(w6, 160), per=128 * 16)
print("done")
