"""Probe: DMA HBM->SMEM + scalar loads in a loop; scalar-load throughput."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(900, exit=True)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled

N = 1 << 20          # 1M i32 in HBM
CH = 8192            # SMEM chunk (32 KiB)
ITER = 1 << 17       # scalar loads per call


def k(x_hbm, out_ref, smem, sem):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, CH)], smem, sem)
    cp.start()
    cp.wait()

    def body(c):
        i, acc = c
        v = smem[(i * 7 + acc) & (CH - 1)]
        return i + 1, acc + v

    def cond(c):
        i, acc = c
        return i < ITER

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[0] = acc


def build(x):
    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((CH,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


xs = [jnp.asarray(np.random.randint(0, 100, N, dtype=np.int32)),
      jnp.asarray(np.random.randint(0, 100, N, dtype=np.int32))]
try:
    r = build(xs[0])
    print("SMEM DMA + scalar loads OK:", np.asarray(r)[0], flush=True)
    t = measure_cycled([(xs[0],), (xs[1],)], build, iters=8)
    print(f"{t*1e3:.3f} ms/call -> {t/ITER*1e9:.2f} ns per dependent "
          f"scalar load+arith", flush=True)
except Exception as e:
    print("FAIL", type(e).__name__, str(e).splitlines()[0][:200], flush=True)
print("done", flush=True)
