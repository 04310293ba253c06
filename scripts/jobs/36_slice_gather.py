"""Measure XLA vmapped-dynamic-slice and row-gather throughput on TPU."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1200, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure

W = 1 << 20
words = jnp.asarray(np.random.randint(0, 1 << 30, W).astype(np.int32))

# A: vmapped dynamic_slice, 768 slices of 1032 words
E, SL = 768, 1032
starts = jnp.asarray(np.sort(np.random.randint(0, W - SL, E)).astype(np.int32))
def mkA(salt):
    return (words + salt.astype(jnp.int32), starts)
def stA(w, s):
    return jax.vmap(lambda st: jax.lax.dynamic_slice(w, (st,), (SL,)))(s)
t = measure(mkA, stA, iters=8)
print(f"A vmap dyn-slice {E}x{SL}: {t*1e3:.2f} ms "
      f"({E*SL/t/1e9:.2f} G elem/s)", flush=True)

# B: row gather (take axis=0): 4096 rows of 128 from a 768-row table
T = jnp.asarray(np.random.randint(0, 1 << 30, (E, 128)).astype(np.int32))
ridx = jnp.asarray(np.random.randint(0, E, 4096).astype(np.int32))
def mkB(salt):
    return (T + salt.astype(jnp.int32), ridx)
def stB(t_, r):
    return jnp.take(t_, r, axis=0)
t = measure(mkB, stB, iters=8)
print(f"B row-gather 4096x128: {t*1e3:.2f} ms "
      f"({4096*128/t/1e9:.2f} G elem/s)", flush=True)

# C: big transpose (G,S,64,128)->(G,64,128,S) for 57MB tok
G, S = 56, 32
tok = jnp.asarray(np.random.randint(0, 1 << 30, (G, S, 64, 128)).astype(np.int32))
def mkC(salt):
    return (tok + salt.astype(jnp.int32),)
def stC(x):
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * 64 * 128, S)
t = measure(mkC, stC, iters=4)
nb = G * S * 64 * 128 * 4
print(f"C transpose {nb>>20} MB: {t*1e3:.2f} ms ({nb/t/1e9:.1f} GB/s)",
      flush=True)

# D: cumsum over 1.8M i32
x = jnp.asarray(np.random.randint(0, 100, 1 << 21).astype(np.int32))
def mkD(salt):
    return (x + salt.astype(jnp.int32),)
def stD(x_):
    return jnp.cumsum(x_)
t = measure(mkD, stD, iters=8)
print(f"D cumsum 2M: {t*1e3:.2f} ms", flush=True)

# E: scatter-fill + cummax segment fill (L from E-table, gather-free)
L = 1 << 19
base = jnp.asarray(np.sort(np.random.randint(0, L, E)).astype(np.int32))
vals = jnp.asarray(np.random.randint(1, 1 << 20, E).astype(np.int32))
def mkE(salt):
    return (base, vals + salt.astype(jnp.int32))
def stE(b, v):
    z = jnp.zeros(L, jnp.int32).at[b].max(v, mode="drop")
    return jax.lax.cummax(z)
t = measure(mkE, stE, iters=8)
print(f"E scatter+cummax fill 512k: {t*1e3:.2f} ms", flush=True)
print("done", flush=True)
