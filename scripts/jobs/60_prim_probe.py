"""Round-4 primitive probe: which data-movement primitives are fast on v5e?

Decides the expand-v4 design: sublane gather, lane gather at scale, one-hot
MXU row gather/scatter, XLA sort/scan/scatter, vector lockstep walk control,
independent-iteration scalar loops.
"""
import functools
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
        extra = ""
        if work:
            extra = f"  ({work / t / 1e9:.2f} G/s)"
        print(f"{name}: {t * 1e3:.3f} ms{extra}", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:300]}", flush=True)
        return None


def two(mk):
    return [mk(i) for i in range(2)]


# ---------- A: sublane gather (take_along_axis axis=0) in Pallas ----------
S, K = 512, 2048
CH = 8  # chained gathers per call


def subg_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:, :]
    idx = idx_ref[:, :]
    acc = jnp.zeros_like(idx)
    for c in range(CH):
        g = jnp.take_along_axis(x, (idx + c) & (S - 1), axis=0)
        acc = acc + g
        idx = (idx ^ g) & (S - 1)
    o_ref[:, :] = acc


def subg(x, idx):
    return pl.pallas_call(
        subg_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)


sets = two(lambda i: (jnp.asarray(rng.integers(0, S, (S, 128)), jnp.int32),
                      jnp.asarray(rng.integers(0, S, (K, 128)), jnp.int32)))
timeit(f"A sublane-gather S={S} K={K} x{CH}", sets, subg, work=K * 128 * CH)

# small-S variant
S2 = 32


def subg2_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:, :]
    idx = idx_ref[:, :]
    acc = jnp.zeros_like(idx)
    for c in range(CH):
        g = jnp.take_along_axis(x, (idx + c) & (S2 - 1), axis=0)
        acc = acc + g
        idx = (idx ^ g) & (S2 - 1)
    o_ref[:, :] = acc


def subg2(x, idx):
    return pl.pallas_call(
        subg2_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)


sets = two(lambda i: (jnp.asarray(rng.integers(0, S2, (S2, 128)), jnp.int32),
                      jnp.asarray(rng.integers(0, S2, (K, 128)), jnp.int32)))
timeit(f"A2 sublane-gather S={S2} K={K} x{CH}", sets, subg2, work=K * 128 * CH)


# ---------- B: lane gather at scale ----------
R = 4096


def laneg_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:, :]
    idx = idx_ref[:, :]
    acc = jnp.zeros_like(idx)
    for c in range(CH):
        g = jnp.take_along_axis(x, (idx + c) & 127, axis=1)
        acc = acc + g
        idx = (idx ^ g) & 127
    o_ref[:, :] = acc


def laneg(x, idx):
    return pl.pallas_call(
        laneg_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)


sets = two(lambda i: (jnp.asarray(rng.integers(0, 128, (R, 128)), jnp.int32),
                      jnp.asarray(rng.integers(0, 128, (R, 128)), jnp.int32)))
timeit(f"B lane-gather R={R} x{CH}", sets, laneg, work=R * 128 * CH)


# ---------- C: one-hot MXU row gather ----------
SB = 512   # buffer rows
NI = 128   # items per round
CH2 = 32


def onehot_kernel(buf_ref, rows_ref, o_ref):
    buf = buf_ref[:, :].astype(jnp.bfloat16)
    rows = rows_ref[:, :]  # (NI//128*... ) use (1,128)? need (NI,) as (8,128)?
    r = rows[:, :1]        # (NI, 1)
    acc = jnp.zeros((NI, 128), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (NI, SB), 1)
    for c in range(CH2):
        oh = (iota == ((r + c) & (SB - 1))).astype(jnp.bfloat16)
        g = jnp.dot(oh, buf, preferred_element_type=jnp.float32)
        acc = acc + g
        r = (r ^ g[:, :1].astype(jnp.int32)) & (SB - 1)
    o_ref[:, :] = acc


def onehotg(buf, rows):
    return pl.pallas_call(
        onehot_kernel,
        out_shape=jax.ShapeDtypeStruct((NI, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(buf, rows)


sets = two(lambda i: (jnp.asarray(rng.integers(0, 256, (SB, 128)), jnp.int32),
                      jnp.asarray(rng.integers(0, SB, (NI, 128)), jnp.int32)))
timeit(f"C onehot-row-gather SB={SB} NI={NI} x{CH2}", sets, onehotg,
       work=NI * CH2)  # row-fetches per call


# ---------- D: XLA sort / scan / scatter ----------
for N in (1 << 20, 5 << 20):
    @jax.jit
    def do_sort(k, v1, v2):
        return jax.lax.sort((k, v1, v2), num_keys=1)

    sets = two(lambda i: (jnp.asarray(rng.integers(0, 1 << 30, N), jnp.int32),
                          jnp.asarray(rng.integers(0, 1 << 30, N), jnp.int32),
                          jnp.asarray(rng.integers(0, 1 << 30, N), jnp.int32)))
    timeit(f"D sort N={N}", sets, do_sort, iters=4, work=N)

N = 2 << 20
sets = two(lambda i: (jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32),))
timeit("D cumsum 2M", sets, jax.jit(lambda x: jnp.cumsum(x)), work=N)
timeit("D cummax 2M", sets, jax.jit(lambda x: jax.lax.cummax(x)), work=N)

for M in (1 << 14, 1 << 20):
    @jax.jit
    def do_scat(tgt, idx, val):
        return tgt.at[idx].max(val, mode="drop")

    sets = two(lambda i: (
        jnp.zeros(N, jnp.int32),
        jnp.asarray(rng.integers(0, N, M), jnp.int32),
        jnp.asarray(rng.integers(0, 1 << 20, M), jnp.int32)))
    timeit(f"D scatter-max M={M} into 2M", sets, do_scat, iters=4, work=M)

    @jax.jit
    def do_gath(src, idx):
        return src[idx]

    sets = two(lambda i: (
        jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32),
        jnp.asarray(rng.integers(0, N, M), jnp.int32)))
    timeit(f"D gather M={M} from 2M", sets, do_gath, iters=4, work=M)


# ---------- E: lockstep vector walk control (no writes) ----------
ROWS = 1408   # ~175K lanes / 128  (2 MB batch scale)
TILE = 64
SL = 32


def lockstep_kernel(tok_ref, o_ref):
    # simulate slot-lockstep control: per-slot vector decode + cursor update
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
    o_ref[:, :] = state


def lockstep(tok):
    G = ROWS // TILE
    return pl.pallas_call(
        lockstep_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((SL * TILE, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM))(tok)


sets = two(lambda i: (jnp.asarray(
    rng.integers(0, 1 << 31, (ROWS * SL, 128)), jnp.int32),))
timeit(f"E lockstep-control {ROWS}rowsx{SL}slots", sets, lockstep,
       work=ROWS * 128 * SL)

# ---------- F: independent-iteration scalar loop (SMEM) ----------
NIT = 16384


def scalar_kernel(items_ref, o_ref, acc_ref):
    def body(i, acc):
        a = items_ref[i, 0]
        b = items_ref[i, 1]
        return acc ^ (a + b)
    acc_ref[0] = jax.lax.fori_loop(0, NIT, body, jnp.int32(0))
    o_ref[0] = acc_ref[0]


def scalar_loop(items):
    return pl.pallas_call(
        scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)])(items)


sets = two(lambda i: (jnp.asarray(
    rng.integers(0, 1 << 20, (NIT, 2)), jnp.int32),))
timeit(f"F indep scalar loop {NIT}", sets, scalar_loop, work=NIT)


# dependent variant
def scalar_dep_kernel(items_ref, o_ref, acc_ref):
    def body(i, acc):
        a = items_ref[acc & (NIT - 1), 0]
        return acc + a
    acc_ref[0] = jax.lax.fori_loop(0, NIT, body, jnp.int32(0))
    o_ref[0] = acc_ref[0]


def scalar_dep(items):
    return pl.pallas_call(
        scalar_dep_kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)])(items)


timeit(f"F dep scalar loop {NIT}", sets, scalar_dep, work=NIT)


# ---------- G: dynamic roll cost ----------
def roll_kernel(x_ref, s_ref, o_ref):
    x = x_ref[:, :]
    sh = s_ref[0]
    for c in range(CH):
        x = pltpu.roll(x, sh + c, 1)
    o_ref[:, :] = x


def rollp(x, s):
    return pl.pallas_call(
        roll_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, s)


sets = two(lambda i: (jnp.asarray(rng.integers(0, 255, (2048, 128)), jnp.int32),
                      jnp.asarray(rng.integers(1, 100, (1,)), jnp.int32)))
timeit(f"G dyn-roll (2048,128) x{CH}", sets, rollp, work=2048 * 128 * CH)

print("done")
