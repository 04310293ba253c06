import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, BL = 16, 1 << 16

def orbit_kernel(next_ref, out_ref):
    out_ref[...] = jnp.zeros((1, BL + 8), jnp.int32)
    def cond(p):
        return p < BL
    def body(p):
        out_ref[0, p] = 1
        return next_ref[0, p]
    jax.lax.while_loop(cond, body, 0)

@jax.jit
def orbits_pallas(next_b):
    return pl.pallas_call(
        orbit_kernel,
        out_shape=jax.ShapeDtypeStruct((B, BL + 8), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, BL + 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BL + 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(next_b)

rng = np.random.default_rng(0)
step = rng.integers(1, 20, (B, BL + 8)).astype(np.int32)
nxt = np.minimum(np.arange(BL + 8)[None, :] + step, BL).astype(np.int32)
nxt[:, BL:] = BL
try:
    out = orbits_pallas(jnp.asarray(nxt))
    int(jnp.sum(out))
    t0 = time.perf_counter(); out = orbits_pallas(jnp.asarray(nxt)); s = int(jnp.sum(out))
    print(f"pallas orbit 16x64K: {(time.perf_counter()-t0)*1e3:.1f} ms, sum={s}")
    flags = np.zeros((B, BL), np.int32)
    for b in range(B):
        p = 0
        while p < BL:
            flags[b, p] = 1
            p = nxt[b, p]
    ok = (np.asarray(out)[:, :BL] == flags).all()
    print("correct:", ok)
except Exception:
    import traceback; traceback.print_exc()
