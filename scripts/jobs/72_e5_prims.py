"""Round-5 primitive probes for the E5 expansion engine (MXU windowed gather).

Questions that decide the design:
  A. reshape legality: (16,128) <-> (2048,1) in Mosaic
  B. bf16 one-hot windowed row-gather: (2048,272)@(272,128) with one-hot
     built in-kernel from integer compares + dynamic 272-row window slice
     -> cost per step (and exactness of byte values through bf16)
  C. int8 matmul support/speed for the same contraction
  D. lane-select after row-gather: take_along_axis (2048,128) idx (2048,1);
     3D take_along; transpose-based fallback
  E. lax.cond skip cost with a big guarded body in a sequential loop
  F. sequential-step floor: fori over 1024 steps with dynamic-slice reads
  G. transpose (128,128) i32 cost
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
        extra = f"  ({work / t / 1e9:.2f} G/s)" if work else ""
        print(f"{name}: {t * 1e3:.3f} ms{extra}", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)
        return None


def two(mk):
    return [mk(i) for i in range(2)]


def run(kern, out_shape, *arrs, scratch=None):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch or [])(*arrs)


# ---------- A: reshape legality ----------
def resh_kernel(x_ref, o_ref):
    x = x_ref[:, :]                       # (16,128) i32
    c = x.reshape(2048, 1)                # flatten -> column
    o_ref[:, :] = (c + 1).reshape(16, 128)


try:
    x = jnp.arange(2048, dtype=jnp.int32).reshape(16, 128)
    r = run(resh_kernel, jax.ShapeDtypeStruct((16, 128), jnp.int32), x)
    ok = bool(jnp.all(r == x + 1))
    print(f"A reshape (16,128)<->(2048,1): {'OK' if ok else 'WRONG'}",
          flush=True)
except Exception as e:
    print(f"A reshape: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)

# ---------- B: bf16 one-hot windowed row gather, full step pipeline -------
SROWS = 2432            # stage rows (u8 values as bf16)
WROWS = 272             # window rows per step
NPOS = 2048             # positions per step
NSTEP = 16              # steps per kernel call (amortize)


def b_kernel(stage_ref, srcrow_ref, srclane_ref, o_ref):
    # stage: (SROWS,128) bf16; srcrow: (NSTEP*16,128) i32 window-rel rows
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, WROWS), 1)

    def step(s, acc):
        base = s * 8                      # pretend-advance window
        win = stage_ref[pl.ds(base, WROWS), :]            # dynamic slice
        sr = srcrow_ref[pl.ds(s * 16, 16), :].reshape(NPOS, 1)
        oh = (sr == iota).astype(jnp.bfloat16)            # (NPOS, WROWS)
        g = jax.lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (NPOS, 128)
        gi = g.astype(jnp.int32)
        return acc + jnp.sum(gi.reshape(16, 128, 128)[:, :, 0]
                             .reshape(16, 128), axis=0, keepdims=True)

    acc = jnp.zeros((1, 128), jnp.int32)
    acc = jax.lax.fori_loop(0, NSTEP, step, acc)
    o_ref[:, :] = acc


try:
    mk = lambda i: (
        jnp.asarray(rng.integers(0, 256, (SROWS, 128)), jnp.bfloat16),
        jnp.asarray(rng.integers(0, WROWS, (NSTEP * 16, 128)), jnp.int32),
        jnp.asarray(rng.integers(0, 128, (NSTEP * 16, 128)), jnp.int32))
    sets = two(mk)
    timeit(f"B bf16 onehot-gather {NPOS}x{WROWS} x{NSTEP}steps", sets,
           lambda a, b, c: run(
               b_kernel, jax.ShapeDtypeStruct((1, 128), jnp.int32), a, b, c),
           work=NPOS * NSTEP)
except Exception as e:
    print(f"B: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)


# correctness of bf16 path on exact bytes (small)
def bc_kernel(stage_ref, srcrow_ref, o_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, WROWS), 1)
    win = stage_ref[pl.ds(0, WROWS), :]
    sr = srcrow_ref[:, :].reshape(2048, 1)
    oh = (sr == iota).astype(jnp.bfloat16)
    g = jax.lax.dot_general(oh, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:, :] = g.astype(jnp.int32)[:, 0:1].reshape(16, 128)


try:
    st = rng.integers(0, 256, (SROWS, 128))
    srn = rng.integers(0, WROWS, (16, 128))
    r = run(bc_kernel, jax.ShapeDtypeStruct((16, 128), jnp.int32),
            jnp.asarray(st, jnp.bfloat16), jnp.asarray(srn, jnp.int32))
    want = st[srn.reshape(-1), 0].reshape(16, 128)
    print(f"B exactness: {'OK' if np.array_equal(np.asarray(r), want) else 'WRONG'}",
          flush=True)
except Exception as e:
    print(f"B exact: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


# ---------- C: int8 matmul ----------
def c_kernel(stage_ref, srcrow_ref, o_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, WROWS), 1)

    def step(s, acc):
        win = stage_ref[pl.ds(s * 8, WROWS), :]
        sr = srcrow_ref[pl.ds(s * 16, 16), :].reshape(NPOS, 1)
        oh = (sr == iota).astype(jnp.int8)
        g = jax.lax.dot_general(oh, win, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + jnp.sum(g.reshape(16, 128, 128)[:, :, 0]
                             .reshape(16, 128), axis=0, keepdims=True)

    o_ref[:, :] = jax.lax.fori_loop(0, NSTEP, step,
                                    jnp.zeros((1, 128), jnp.int32))


try:
    mk = lambda i: (
        jnp.asarray(rng.integers(0, 127, (SROWS, 128)), jnp.int8),
        jnp.asarray(rng.integers(0, WROWS, (NSTEP * 16, 128)), jnp.int32))
    sets = two(mk)
    timeit(f"C int8 onehot-gather {NPOS}x{WROWS} x{NSTEP}steps", sets,
           lambda a, b: run(
               c_kernel, jax.ShapeDtypeStruct((1, 128), jnp.int32), a, b),
           work=NPOS * NSTEP)
except Exception as e:
    print(f"C: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)


# ---------- D: lane-select options ----------
def d1_kernel(g_ref, lane_ref, o_ref):
    g = g_ref[:, :]                            # (2048,128) i32
    idx = lane_ref[:, :].reshape(2048, 1)
    v = jnp.take_along_axis(g, idx, axis=1)    # (2048,1)
    o_ref[:, :] = v.reshape(16, 128)


try:
    g = jnp.asarray(rng.integers(0, 1000, (2048, 128)), jnp.int32)
    lane = jnp.asarray(rng.integers(0, 128, (16, 128)), jnp.int32)
    r = run(d1_kernel, jax.ShapeDtypeStruct((16, 128), jnp.int32), g, lane)
    want = np.asarray(g)[np.arange(2048), np.asarray(lane).reshape(-1)]
    ok = np.array_equal(np.asarray(r).reshape(-1), want)
    print(f"D1 take_along (2048,128)+reshape: {'OK' if ok else 'WRONG'}",
          flush=True)
    sets = two(lambda i: (
        jnp.asarray(rng.integers(0, 1000, (2048, 128)), jnp.int32),
        jnp.asarray(rng.integers(0, 128, (16, 128)), jnp.int32)))

    def d1_loop_kernel(g_ref, lane_ref, o_ref):
        def step(s, acc):
            v = jnp.take_along_axis(
                g_ref[:, :], ((lane_ref[:, :].reshape(2048, 1) + s) & 127),
                axis=1)
            return acc + v.reshape(16, 128)
        o_ref[:, :] = jax.lax.fori_loop(
            0, 64, step, jnp.zeros((16, 128), jnp.int32))

    timeit("D1 take+reshape x64", sets,
           lambda a, b: run(d1_loop_kernel,
                            jax.ShapeDtypeStruct((16, 128), jnp.int32), a, b),
           work=2048 * 64)
except Exception as e:
    print(f"D1: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)


# ---------- E: cond-skip cost in a loop ----------
def e_kernel(stage_ref, srcrow_ref, flags_ref, o_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, WROWS), 1)

    def big(s):
        win = stage_ref[pl.ds(s * 8, WROWS), :]
        sr = srcrow_ref[pl.ds(s * 16, 16), :].reshape(NPOS, 1)
        oh = (sr == iota).astype(jnp.bfloat16)
        g = jax.lax.dot_general(oh, win, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(g.astype(jnp.int32).reshape(16, 128, 128)[:, :, 0]
                       .reshape(16, 128), axis=0, keepdims=True)

    def step(s, acc):
        f = flags_ref[s]
        acc = acc + jax.lax.cond(
            f > 0, lambda: big(s), lambda: jnp.zeros((1, 128), jnp.int32))
        return acc

    o_ref[:, :] = jax.lax.fori_loop(0, NSTEP, step,
                                    jnp.zeros((1, 128), jnp.int32))


for frac, name in ((0, "0%"), (1, "100%")):
    try:
        mk = lambda i: (
            jnp.asarray(rng.integers(0, 256, (SROWS, 128)), jnp.bfloat16),
            jnp.asarray(rng.integers(0, WROWS, (NSTEP * 16, 128)), jnp.int32),
            jnp.asarray(np.full(NSTEP, frac, np.int32)))
        sets = two(mk)

        def efn(a, b, c):
            return pl.pallas_call(
                e_kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b, c)

        timeit(f"E cond-gather taken={name} x{NSTEP}", sets, efn)
    except Exception as e:
        print(f"E {name}: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)


# ---------- F: sequential floor — 1024 steps, dyn slices + small ops ------
def f_kernel(stage_ref, o_ref):
    def step(s, acc):
        w = stage_ref[pl.ds((s * 8) & 2047, 16), :]
        return acc + jnp.sum(w[0:1, :] , axis=0, keepdims=True).astype(jnp.int32)

    o_ref[:, :] = jax.lax.fori_loop(0, 1024, step,
                                    jnp.zeros((1, 128), jnp.int32))


try:
    sets = two(lambda i: (
        jnp.asarray(rng.integers(0, 256, (SROWS, 128)), jnp.int32),))
    timeit("F fori 1024 steps dyn-slice floor", sets,
           lambda a: run(f_kernel,
                         jax.ShapeDtypeStruct((1, 128), jnp.int32), a))
except Exception as e:
    print(f"F: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)


# ---------- G: transpose (128,128) i32 ----------
def g_kernel(x_ref, o_ref):
    def step(s, acc):
        return acc + jnp.transpose(x_ref[:, :] + s, (1, 0))
    o_ref[:, :] = jax.lax.fori_loop(0, 64, step,
                                    jnp.zeros((128, 128), jnp.int32))


try:
    sets = two(lambda i: (
        jnp.asarray(rng.integers(0, 256, (128, 128)), jnp.int32),))
    timeit("G transpose 128x128 x64", sets,
           lambda a: run(g_kernel,
                         jax.ShapeDtypeStruct((128, 128), jnp.int32), a))
except Exception as e:
    print(f"G: FAIL {type(e).__name__} {str(e)[:250]}", flush=True)

print("done", flush=True)
