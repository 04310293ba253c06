"""Minimal probe: take_along_axis over lanes inside a Pallas kernel."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k1(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

tab = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (8, 128)), jnp.int32)
try:
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    print("take_along_axis lanes:", "OK" if np.array_equal(np.asarray(out), ref) else "WRONG")
except Exception as e:
    print("take_along_axis lanes: FAIL", repr(e)[:300])
print("done", flush=True)
