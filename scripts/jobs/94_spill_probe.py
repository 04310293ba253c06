"""Does cond/while nesting around the fetch+write body blow up cost?
S0 straight-line; S1 4x while; S2 + cond(go); S3 + cond(false morephases);
S4 + write-while."""
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
RB = 2304
NBATCH = 256
NB = 128
WROWS = 416


def make(variant):
    def body_round(bi, items_ref, bo_ref, iotas):
        iota_w, iota_nb, iota_32 = iotas
        items = items_ref[pl.ds(bi * 4, 4), :]
        dst = items[0:1, :].reshape(NB, 1)
        src = items[1:2, :].reshape(NB, 1)
        w = items[2:3, :].reshape(NB, 1)
        base = pl.multiple_of(((bi * 16) >> 4) << 4, 16)
        win = bo_ref[pl.ds(base, WROWS), :]
        srow = jnp.clip((src - base * 128) >> 7, 0, WROWS - 2)
        oh1 = (iota_w == srow).astype(jnp.bfloat16)
        oh2 = (iota_w == srow + 1).astype(jnp.bfloat16)
        f1 = jnp.dot(oh1, win, preferred_element_type=jnp.float32)
        f2 = jnp.dot(oh2, win, preferred_element_type=jnp.float32)
        idx = (src & 127) + iota_nb
        g1 = jnp.take_along_axis(f1, idx & 127, axis=1)
        g2 = jnp.take_along_axis(f2, idx & 127, axis=1)
        bytes_ = jnp.where(idx < 128, g1, g2)
        rot = jnp.take_along_axis(bytes_, (iota_nb - (dst & 127)) & 127,
                                  axis=1)
        m1 = (iota_nb >= (dst & 127)) & (iota_nb < (dst & 127) + w)
        m2 = iota_nb < (dst & 127) + w - 128
        c1 = jnp.where(m1, rot, 0.0).astype(jnp.bfloat16)
        c2 = jnp.where(m2, rot, 0.0).astype(jnp.bfloat16)
        wbase = pl.multiple_of((((bi * 16) + 256) >> 4) << 4, 16)
        drow = jnp.clip((dst - wbase * 128) >> 7, 0, 30)
        ohw1 = (iota_32 == drow).astype(jnp.bfloat16)
        ohw2 = (iota_32 == jnp.clip(drow + 1, 0, 31)).astype(jnp.bfloat16)
        dnums = (((0,), (0,)), ((), ()))
        dlt = (jax.lax.dot_general(ohw1, c1, dimension_numbers=dnums,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(ohw2, c2, dimension_numbers=dnums,
                                     preferred_element_type=jnp.float32))
        cvm = (jax.lax.dot_general(
            ohw1, jnp.where(m1, 1.0, 0.0).astype(jnp.bfloat16),
            dimension_numbers=dnums, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                ohw2, jnp.where(m2, 1.0, 0.0).astype(jnp.bfloat16),
                dimension_numbers=dnums,
                preferred_element_type=jnp.float32))
        old = bo_ref[pl.ds(wbase, 32), :].astype(jnp.float32)
        bo_ref[pl.ds(wbase, 32), :] = jnp.where(cvm > 0, dlt, old).astype(
            jnp.bfloat16)
        return jnp.sum(dlt[0:1, :1])

    def kernel(items_ref, b_in, bo_ref, sig_ref):
        del b_in
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (NB, WROWS), 1)
        iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 1)
        iota_32 = jax.lax.broadcasted_iota(jnp.int32, (NB, 32), 1)
        iotas = (iota_w, iota_nb, iota_32)
        sig_ref[...] = jnp.zeros((8, 128), jnp.float32)

        def batch(bi, carry):
            if variant == 0:
                r = body_round(bi, items_ref, bo_ref, iotas)
                return carry + r
            # sub-round while (4 fixed)
            def scond(c):
                it, acc = c
                return it < 4

            def sbody(c):
                it, acc = c
                if variant >= 2:
                    go = (bi + it) >= 0

                    def do(_):
                        return body_round(bi, items_ref, bo_ref, iotas)

                    r = jax.lax.cond(go, do, lambda _: jnp.float32(0),
                                     jnp.int32(0))
                else:
                    r = body_round(bi, items_ref, bo_ref, iotas)
                if variant >= 3:
                    anyp = (bi + it) < 0    # always false

                    def more(_):
                        a = body_round(bi, items_ref, bo_ref, iotas)
                        b = body_round(bi, items_ref, bo_ref, iotas)
                        return a + b

                    r = r + jax.lax.cond(anyp, more,
                                         lambda _: jnp.float32(0),
                                         jnp.int32(0))
                if variant >= 4:
                    def wc(cc):
                        k, a = cc
                        return k < 1

                    def wb(cc):
                        k, a = cc
                        return k + 1, a + 1.0

                    _, extra = jax.lax.while_loop(wc, wb,
                                                  (jnp.int32(0),
                                                   jnp.float32(0)))
                    r = r + extra
                return it + 1, acc + r

            _, acc = jax.lax.while_loop(scond, sbody,
                                        (jnp.int32(0), carry))
            return acc

        acc = jax.lax.fori_loop(0, NBATCH, batch, jnp.float32(0))
        sig_ref[0:1, :] = jnp.full((1, 128), acc, jnp.float32)

    def run(items, b0):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((RB, 128), jnp.bfloat16),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            input_output_aliases={1: 0},
        )(items, b0)
    return run


sets = [(jnp.asarray(rng.integers(0, 1 << 16, (NBATCH * 4, 128)), jnp.int32),
         jnp.asarray(rng.integers(0, 256, (RB, 128)), jnp.int32).astype(
             jnp.bfloat16)) for _ in range(2)]
for v in range(5):
    try:
        t = measure_cycled(sets, make(v), iters=8)
        rounds = NBATCH * (1 if v == 0 else 4)
        print(f"S{v}: {t * 1e3:.3f} ms  ({t / rounds * 1e9:.0f} ns/round)",
              flush=True)
    except Exception as e:
        print(f"S{v}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
print("done")
