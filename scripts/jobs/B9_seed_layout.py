"""Seed-kernel layout micro: is the 20 us/region cost the (1,N)->(N,1)
column reshapes (cross-lane transposes) or the one-hot builds?

A: current layout — (1, CANDW) rows, column reshape for lane one-hot
B: candidate-major — (64, 128) block, 3D lane one-hot (leading reshape),
   Rm as (CAND, ROWS) with dim0-dim0 contraction
C: A without the column reshapes (constant Wl) — isolates the transposes
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from devtime import measure_cycled

CANDW = 8192
ROWS = 32
REPS = 64


def kA(off_ref, seed_ref, o_ref):
    riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, acc):
        offw = off_ref[:, :] + i
        seedw = seed_ref[:, :]
        orel = jnp.where(seedw != 0, offw & 4095, 4096)
        Rm = jnp.where((orel >> 7) == riota, 1, 0).astype(jnp.bfloat16)
        oc = orel.reshape(CANDW, 1)
        sc = seedw.reshape(CANDW, 1)
        ohl = (oc & 127) == liota
        out = acc
        for shift in (0, 8):
            pv = (sc >> shift) & 0xFF
            Wl = jnp.where(ohl, pv, 0).astype(jnp.bfloat16)
            m = jax.lax.dot_general(Rm, Wl, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = out + m.astype(jnp.int32)
        return out

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((ROWS, 128), jnp.int32))


def kB(off_ref, seed_ref, o_ref):
    CR = CANDW // 128
    riota3 = jax.lax.broadcasted_iota(jnp.int32, (CR, 128, ROWS), 2)
    liota3 = jax.lax.broadcasted_iota(jnp.int32, (CR, 128, 128), 2)

    def body(i, acc):
        offw = off_ref[:, :] + i            # (CR, 128)
        seedw = seed_ref[:, :]
        orel = jnp.where(seedw != 0, offw & 4095, 4096)
        Rm = jnp.where((orel >> 7)[:, :, None] == riota3, 1, 0).astype(
            jnp.bfloat16).reshape(CANDW, ROWS)
        ohl = (orel & 127)[:, :, None] == liota3
        out = acc
        for shift in (0, 8):
            pv = (seedw >> shift) & 0xFF
            Wl = jnp.where(ohl, pv[:, :, None], 0).astype(
                jnp.bfloat16).reshape(CANDW, 128)
            m = jax.lax.dot_general(Rm, Wl, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = out + m.astype(jnp.int32)
        return out

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((ROWS, 128), jnp.int32))


def kC(off_ref, seed_ref, o_ref):
    riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    wl_const = jnp.ones((CANDW, 128), jnp.bfloat16)

    def body(i, acc):
        offw = off_ref[:, :] + i
        seedw = seed_ref[:, :]
        orel = jnp.where(seedw != 0, offw & 4095, 4096)
        Rm = jnp.where((orel >> 7) == riota, 1, 0).astype(jnp.bfloat16)
        out = acc
        for _ in (0, 1):
            m = jax.lax.dot_general(Rm, wl_const, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = out + m.astype(jnp.int32)
        return out

    o_ref[:, :] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((ROWS, 128), jnp.int32))


rng = np.random.default_rng(1)
for name, kern, shape in [("A_row_broadcast", kA, (1, CANDW)),
                          ("B_cand_major_3d", kB, (CANDW // 128, 128)),
                          ("C_A_no_col_reshape", kC, (1, CANDW))]:
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32)))
    sets = []
    for s in range(2):
        r2 = np.random.default_rng(s + 1)
        sets.append((jnp.asarray(r2.integers(0, 4096, shape, np.int32)),
                     jnp.asarray(r2.integers(0, 65536, shape, np.int32))))
    try:
        t = measure_cycled(sets, f, iters=4)
        print(f"{name}: {t/REPS*1e6:.2f} us/region-contrib", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)
