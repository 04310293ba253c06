"""Primitive probes for the expand v2 resolve design:
  P1: i8 x i8 -> i32 matmul support + speed in Pallas (one-hot gather)
  P2: bf16 one-hot (2048,288)@(288,128) speed (current big-gather shape)
  P3: lane-select via one-hot mul+rowsum (2048,128)
  P4: butterfly stage cost on (16,128) i32 (flat-shift via roll pair)
  P5: small doubling-round matmul (2048,16)@(16,128) x2 planes
Each timed as N reps inside one kernel to amortize dispatch."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from devtime import measure_cycled

REPS = 64


def timeit(name, kernel, inputs, out_shape, scratch=()):
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=list(scratch),
        )
        f = jax.jit(f)
        sets = []
        for s in range(2):
            rng = np.random.default_rng(s + 1)
            sets.append(tuple(
                jnp.asarray(rng.integers(0, 100, x.shape).astype(x.dtype))
                for x in inputs))
        t = measure_cycled(sets, f, iters=4)
        print(f"{name}: {t/REPS*1e6:.2f} us/rep  ({t*1e3:.3f} ms total)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


# P1: i8 matmul
def k_i8(a_ref, b_ref, o_ref):
    def body(i, acc):
        m = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc + m

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((2048, 128), jnp.int32))

timeit("P1_i8mm_2048x288x128",
       k_i8,
       (np.zeros((2048, 288), np.int8), np.zeros((288, 128), np.int8)),
       jax.ShapeDtypeStruct((2048, 128), jnp.int32))


# P2: bf16 matmul same shape
def k_bf(a_ref, b_ref, o_ref):
    def body(i, acc):
        m = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + m

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((2048, 128), jnp.float32))

timeit("P2_bf16mm_2048x288x128",
       k_bf,
       (np.zeros((2048, 288), np.float32), np.zeros((288, 128), np.float32)),
       jax.ShapeDtypeStruct((2048, 128), jnp.float32))
# note: inputs f32, cast in-kernel below would be fairer; close enough if
# this fails switch dtypes


# P2b: bf16 with one-hot built in-kernel from indices
def k_bf_oh(idx_ref, w_ref, o_ref):
    wi = jax.lax.broadcasted_iota(jnp.int32, (1, 288), 1)

    def body(i, acc):
        oh = (idx_ref[:, :] + i == wi).astype(jnp.bfloat16)  # (2048,288)
        m = jax.lax.dot_general(
            oh, w_ref[:, :].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + m

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((2048, 128), jnp.float32))

timeit("P2b_ohbuild+bf16mm",
       k_bf_oh,
       (np.zeros((2048, 1), np.int32), np.zeros((288, 128), np.float32)),
       jax.ShapeDtypeStruct((2048, 128), jnp.float32))


# P3: lane select mul+rowsum
def k_sel(g_ref, l_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)

    def body(i, acc):
        m = (lane == (l_ref[:, :] + i) % 128).astype(jnp.int32)
        v = jnp.sum(g_ref[:, :] * m, axis=1).reshape(16, 128)
        return acc + v

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((16, 128), jnp.int32))

timeit("P3_lane_select_2048",
       k_sel,
       (np.zeros((2048, 128), np.int32), np.zeros((2048, 1), np.int32)),
       jax.ShapeDtypeStruct((16, 128), jnp.int32))


# P4: butterfly stage: flat shift of (16,128) by sh with row/lane rolls
def k_bfly(s_ref, o_ref):
    def body(i, S):
        for b in range(9):
            sh = 1 << b
            rsh, lsh = sh >> 7, sh & 127
            a = pltpu.roll(S, lsh, 1)
            up = pltpu.roll(S, rsh + 1, 0)
            al = pltpu.roll(up, lsh, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
            shifted = jnp.where(lane >= lsh, a, al)
            S = jnp.where((S & (1 << 25)) != 0, S, shifted + (sh << 15))
        return S

    o_ref[:, :] = jax.lax.fori_loop(0, REPS, body, s_ref[:, :])

timeit("P4_butterfly9_16x128",
       k_bfly,
       (np.zeros((16, 128), np.int32),),
       jax.ShapeDtypeStruct((16, 128), jnp.int32))


# P5: doubling-round pair: 2-plane (2048,16)@(16,128) + select
def k_dbl(c_ref, o_ref):
    wi = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)

    def body(i, cur):
        qrel = (cur + i) & 2047
        oh = ((qrel >> 7).reshape(2048, 1) == wi).astype(jnp.bfloat16)
        lo = (cur & 0xFF).astype(jnp.bfloat16)
        hi = ((cur >> 8) & 0xFF).astype(jnp.bfloat16)
        glo = jax.lax.dot_general(oh, lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ghi = jax.lax.dot_general(oh, hi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        m = (lane == (qrel & 127).reshape(2048, 1)).astype(jnp.int32)
        vlo = jnp.sum(glo.astype(jnp.int32) * m, axis=1).reshape(16, 128)
        vhi = jnp.sum(ghi.astype(jnp.int32) * m, axis=1).reshape(16, 128)
        return (vhi << 8) | vlo

    o_ref[:, :] = jax.lax.fori_loop(0, REPS, body, c_ref[:, :])

timeit("P5_doubling_round_2048",
       k_dbl,
       (np.zeros((16, 128), np.int32),),
       jax.ShapeDtypeStruct((16, 128), jnp.int32))
