"""Second Pallas gather probe: minimal tiles, varied dtypes/shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def run(name, kernel, args, out_shape):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        r = fn(*args)
        r.block_until_ready()
        print(f"{name}: OK {np.asarray(r).reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False

# A: take_along_axis lanes, (8,128) i32
def kA(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :] & 127, axis=1)
tab = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :] * 2, (8, 128))
idx = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
run("A lanes i32 (8,128)", kA, (jnp.asarray(tab), idx),
    jax.ShapeDtypeStruct((8, 128), jnp.int32))

# B: f32 variant
def kB(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :] & 127, axis=1)
tabf = jnp.asarray(np.arange(1024, dtype=np.float32).reshape(8, 128))
run("B lanes f32 (8,128)", kB, (tabf, idx),
    jax.ShapeDtypeStruct((8, 128), jnp.float32))

# C: u32
tabu = jnp.asarray(np.arange(1024, dtype=np.uint32).reshape(8, 128))
run("C lanes u32 (8,128)", kB, (tabu, idx),
    jax.ShapeDtypeStruct((8, 128), jnp.uint32))

# D: (64,128) larger sublane count, lanes gather
idx2 = jnp.asarray(np.random.randint(0, 128, (64, 128)), jnp.int32)
tab2 = jnp.asarray(np.arange(64 * 128, dtype=np.int32).reshape(64, 128))
run("D lanes i32 (64,128)", kA, (tab2, idx2),
    jax.ShapeDtypeStruct((64, 128), jnp.int32))

# E: gather wider row: (8, 512) gather along axis 1
def kE(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :] & 511, axis=1)
tab3 = jnp.asarray(np.arange(8 * 512, dtype=np.int32).reshape(8, 512))
idx3 = jnp.asarray(np.random.randint(0, 512, (8, 512)), jnp.int32)
run("E lanes i32 (8,512)", kE, (tab3, idx3),
    jax.ShapeDtypeStruct((8, 512), jnp.int32))

# F: dynamic_slice row by scalar (known-good pattern baseline)
def kF(tab_ref, idx_ref, out_ref):
    i = idx_ref[0, 0]
    out_ref[:, :] = tab_ref[pl.ds(i & 7, 8), :]
run("F dyn row slice", kF, (jnp.asarray(tab), idx),
    jax.ShapeDtypeStruct((8, 128), jnp.int32))

# G: jnp.take along axis 0 with vector idx (sublane gather alt form)
def kG(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[0, :] & 63, axis=0)[:8, :]
run("G take axis0", kG, (tab2, idx2), jax.ShapeDtypeStruct((8, 128), jnp.int32))

# H: one-hot matmul lookup (MXU): 128-entry table, (128,128) idx
def kH(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:, :] & 127
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    # out[i, j] = tab[idx[i, j]] would need per-element... do row-lookup:
    # out[i, :] = onehot(idx[i, 0]) @ tab ... instead do full: for vector of
    # 128 indices per row: onehot (128,128) @ tab (128,1)? -> per-row scalar.
    # Simplest useful: gather 128 values = onehot(idx_row) (128x128) @ tab_col
    oh = (idx[:, :, None] == lane[None, 0, :, None]).astype(jnp.bfloat16)
    out_ref[:, :] = idx  # placeholder, measure separately
run("H skip", lambda *a: None, (), None) if False else print("H skipped")

print("done")
