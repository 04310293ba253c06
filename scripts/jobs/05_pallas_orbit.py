import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, BL = 16, 1 << 16
L = BL + 128  # 65664, divisible by 128
ROWS = 8

def orbit_kernel(next_ref, out_ref):
    out_ref[...] = jnp.zeros((ROWS, L), jnp.int32)
    for r in range(ROWS):
        def cond(p):
            return p < BL
        def body(p):
            out_ref[r, p] = 1
            return next_ref[r, p]
        jax.lax.while_loop(cond, body, 0)

@jax.jit
def orbits_pallas(next_b):
    return pl.pallas_call(
        orbit_kernel,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        grid=(B // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(next_b)

rng = np.random.default_rng(0)
step = rng.integers(1, 20, (B, L)).astype(np.int32)
nxt = np.minimum(np.arange(L)[None, :] + step, BL).astype(np.int32)
nxt[:, BL:] = BL
try:
    out = orbits_pallas(jnp.asarray(nxt))
    int(jnp.sum(out))
    t0 = time.perf_counter(); out = orbits_pallas(jnp.asarray(nxt)); s = int(jnp.sum(out))
    print(f"pallas orbit 16x64K: {(time.perf_counter()-t0)*1e3:.1f} ms, tokens={s}")
    flags = np.zeros((B, BL), np.int32)
    for b in range(B):
        p = 0
        while p < BL:
            flags[b, p] = 1
            p = nxt[b, p]
    print("correct:", (np.asarray(out)[:, :BL] == flags).all())
except Exception:
    import traceback; print(traceback.format_exc())
