"""Time Pallas lane-gather (take_along_axis axis=1) and in-kernel loop cost."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1500, exit=True)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure

R = 64            # rows per tile
STEPS = 256       # loop steps inside kernel

def probe(name, nops_fn, kernel):
    def build(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    tab = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    def mk(salt):
        return (tab, (idx + salt.astype(jnp.int32)) & 127)
    try:
        t = measure(mk, build, iters=8)
        per_step = t / STEPS
        n = nops_fn()
        print(f"{name}: {t*1e3:.3f} ms/call, {per_step*1e6:.2f} us/step, "
              f"{n/t/1e9:.2f} G lanegathers/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:150]}", flush=True)

# K1: one gather per loop step
def k1(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, p):
        g = jnp.take_along_axis(tab, p & 127, axis=1)
        return (p + g + 1) & 127
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("K1 1 gather/step", lambda: R * 128 * STEPS, k1)

# K2: 8 gathers per loop step (dependent)
def k2(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, p):
        for _ in range(8):
            p = (p + jnp.take_along_axis(tab, p & 127, axis=1) + 1) & 127
        return p
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("K2 8 gathers/step", lambda: R * 128 * STEPS * 8, k2)

# K3: pure vector ops loop (30 ops/step) for loop overhead baseline
def k3(tab_ref, idx_ref, out_ref):
    def body(i, p):
        for _ in range(30):
            p = ((p * 5) ^ (p >> 3)) + 1
        return p
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("K3 30 vecops/step", lambda: R * 128 * STEPS * 30, k3)

# K4: gather with R=8 tile (smaller)
def probe8(name):
    R8 = 8
    def k(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:, :]
        def body(i, p):
            g = jnp.take_along_axis(tab, p & 127, axis=1)
            return (p + g + 1) & 127
        out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
    def build(tab, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    tab = jnp.asarray(np.random.randint(0, 128, (R8, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (R8, 128)), jnp.int32)
    def mk(salt):
        return (tab, (idx + salt.astype(jnp.int32)) & 127)
    t = measure(mk, build, iters=8)
    print(f"{name}: {t*1e3:.3f} ms/call, {t/STEPS*1e6:.2f} us/step, "
          f"{R8*128*STEPS/t/1e9:.2f} G lanegathers/s", flush=True)
probe8("K4 1 gather/step R=8")

# K5: variable per-lane shifts (needed for bit extraction)
def k5(tab_ref, idx_ref, out_ref):
    def body(i, p):
        for _ in range(10):
            p = ((p >> (p & 7)) | (p << 2)) + 1
        return p
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("K5 10 varshift/step", lambda: R * 128 * STEPS * 10, k5)
print("done", flush=True)
