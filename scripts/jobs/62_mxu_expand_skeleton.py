"""Round-4: cost skeleton of the MXU batch-expand inner loop.

Per 128-item batch: item row reads, 2 intra-batch compare-matrix rounds,
one-hot window row-fetch (2 matmuls over a 416-row window), lane-gather
merges, one-hot scatter write (matmul) + blend, dynamic-slice B update.
Measures ms for NBATCH batches -> projected ms per 2 MB (1100 batches).

Also re-probes: E lockstep control (fixed), F scalar loops (fixed).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from devtime import measure_cycled
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def timeit(name, sets, fn, iters=8, work=None):
    try:
        t = measure_cycled(sets, fn, iters=iters)
        extra = f"  ({work / t / 1e9:.3f} G/s)" if work else ""
        print(f"{name}: {t * 1e3:.3f} ms{extra}", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:300]}", flush=True)
        return None


def two(mk):
    return [mk(i) for i in range(2)]


NB = 128          # items per batch
WROWS = 416       # one-hot source window rows (32 KiB + batch span)
RB = 2304         # B slab rows for the skeleton (288 KiB bytes)
NBATCH = 128      # batches per call


def skel_kernel(items_ref, b_ref, o_ref):
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (NB, WROWS), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 1)

    def body(bi, carry):
        items = items_ref[pl.ds(bi * 4, 4), :]        # dst,src,w,aux rows
        dst = items[0:1, :]
        src = items[1:2, :]
        w = items[2:3, :]

        # 2 intra-batch compare-matrix rounds (jump/rank skeleton)
        dcol = dst.reshape(NB, 1)
        scol = src.reshape(NB, 1)
        for _ in range(2):
            cmpm = (dcol.reshape(1, NB) <= scol).astype(jnp.int32)
            cov = jnp.sum(cmpm, axis=1, keepdims=True)      # covering rank
            scol = scol - (cov & 63)

        # window base for this batch (aligned)
        base = pl.multiple_of(((bi * 16) >> 4) << 4, 16)
        win = b_ref[pl.ds(base, WROWS), :]                   # bf16 window

        srow = jnp.clip((scol - base * 128) >> 7, 0, WROWS - 2)
        oh1 = (iota_w == srow).astype(jnp.bfloat16)
        oh2 = (iota_w == srow + 1).astype(jnp.bfloat16)
        f1 = jnp.dot(oh1, win, preferred_element_type=jnp.float32)
        f2 = jnp.dot(oh2, win, preferred_element_type=jnp.float32)

        # per-element source index within the 256-byte pair + merge
        idx = (scol & 127) + iota_n
        g1 = jnp.take_along_axis(f1, idx & 127, axis=1)
        g2 = jnp.take_along_axis(f2, idx & 127, axis=1)
        bytes_ = jnp.where(idx < 128, g1, g2)

        # rotate to dst lane positions + mask to w
        rot = jnp.take_along_axis(
            bytes_, (iota_n - (dcol & 127)) & 127, axis=1)
        m1 = ((iota_n >= (dcol & 127))
              & (iota_n < (dcol & 127) + w.reshape(NB, 1)))
        c1 = jnp.where(m1, rot, 0.0).astype(jnp.bfloat16)
        m2 = iota_n < (dcol & 127) + w.reshape(NB, 1) - 128
        c2 = jnp.where(m2, rot, 0.0).astype(jnp.bfloat16)

        # scatter matmul into 32 write rows
        wbase = pl.multiple_of((((bi * 16) + 256) >> 4) << 4, 16)
        drow = jnp.clip((dcol - wbase * 128) >> 7, 0, 30)
        iota_wr = jax.lax.broadcasted_iota(jnp.int32, (32, NB), 1)
        ohw1 = (iota_wr == drow.reshape(1, NB)).astype(jnp.bfloat16)
        ohw2 = (iota_wr == (drow + 1).reshape(1, NB)).astype(jnp.bfloat16)
        delta = (jnp.dot(ohw1, c1, preferred_element_type=jnp.float32)
                 + jnp.dot(ohw2, c2, preferred_element_type=jnp.float32))
        covm = (jnp.dot(ohw1, jnp.where(m1, 1.0, 0.0).astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + jnp.dot(ohw2, jnp.where(m2, 1.0, 0.0).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32))
        old = b_ref[pl.ds(wbase, 32), :].astype(jnp.float32)
        new = jnp.where(covm > 0, delta, old).astype(jnp.bfloat16)
        b_ref[pl.ds(wbase, 32), :] = new
        return carry + jnp.sum(delta[0:1, :1])

    acc = jax.lax.fori_loop(0, NBATCH, body, jnp.float32(0))
    o_ref[0, 0] = acc


def skel(items, b0):
    return pl.pallas_call(
        skel_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        input_output_aliases={},
    )(items, b0)


sets = two(lambda i: (
    jnp.asarray(rng.integers(0, 1 << 16, (NBATCH * 4, 128)), jnp.int32),
    jnp.asarray(rng.integers(0, 256, (RB, 128)), jnp.int32).astype(
        jnp.bfloat16)))
t = timeit(f"SKEL {NBATCH} batches", sets, skel, iters=8)
if t:
    print(f"  projected per 2MB (1100 batches): {t * 1100 / NBATCH * 1e3:.2f} ms",
          flush=True)


# ---------- E lockstep control (fixed) ----------
ROWS = 1408
TILE = 64
SL = 32


def lockstep_kernel(tok_ref, o_ref):
    cur = jnp.zeros((TILE, 128), jnp.int32)
    state = jnp.zeros((TILE, 128), jnp.int32)
    for s in range(SL):
        t = tok_ref[pl.ds(s * TILE, TILE), :]
        kind = (t >> 30) & 3
        ln = t & 0x1FF
        d = (t >> 9) & 0x7FFF
        w = jnp.where(kind == 1, 1, jnp.minimum(ln, 128))
        cur = cur + jnp.where(kind > 0, w, 0)
        state = state ^ (cur + d)
    o_ref[...] = state


def lockstep(tok):
    G = ROWS // TILE
    return pl.pallas_call(
        lockstep_kernel,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        in_specs=[pl.BlockSpec((SL * TILE, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM))(tok)


sets = two(lambda i: (jnp.asarray(
    rng.integers(0, 1 << 31, (ROWS * SL, 128)), np.int32),))
timeit(f"E lockstep-control {ROWS}x{SL}", sets, lockstep,
       work=ROWS * 128 * SL)

# ---------- F scalar loops (fixed: 2D smem out) ----------
NIT = 16384


def scalar_kernel(items_ref, o_ref):
    def body(i, acc):
        return acc ^ (items_ref[i, 0] + items_ref[i, 1])
    o_ref[0, 0] = jax.lax.fori_loop(0, NIT, body, jnp.int32(0))


def scalar_loop(items):
    return pl.pallas_call(
        scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(items)


sets = two(lambda i: (jnp.asarray(
    rng.integers(0, 1 << 20, (NIT, 2)), jnp.int32),))
timeit(f"F indep scalar loop {NIT}", sets, scalar_loop, work=NIT)


def scalar_dep_kernel(items_ref, o_ref):
    def body(i, acc):
        return acc + items_ref[acc & (NIT - 1), 0]
    o_ref[0, 0] = jax.lax.fori_loop(0, NIT, body, jnp.int32(0))


def scalar_dep(items):
    return pl.pallas_call(
        scalar_dep_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(items)


timeit(f"F dep scalar loop {NIT}", sets, scalar_dep, work=NIT)

print("done")
