"""Ablate ops/bitpack.pack internals: cumsums vs boundary scatter-max vs
boundary gathers. N ~ 1.09M items, num_words ~ 360K (1 MB batch shapes).
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1800, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled

N = 1 << 20
NW = 360_000
rng = np.random.default_rng(0)
sets = []
for s in range(2):
    nb = np.where(rng.random(N) < 0.2, rng.integers(5, 20, N), 0)
    lo = rng.integers(0, 1 << 16, N).astype(np.uint32)
    sets.append((jnp.asarray(lo), jnp.asarray(lo), jnp.asarray(nb, np.int32)))

def a_cumsums(lo, hi, nbits):
    offs = jnp.cumsum(nbits) - nbits
    s = (offs & 31).astype(jnp.uint32)
    rs = jnp.minimum(32 - s, 31)
    live = nbits > 0
    w0 = jnp.where(live, lo << s, 0)
    w1 = jnp.where(live, jnp.where(s == 0, 0, lo >> rs) | (hi << s), 0)
    w2 = jnp.where(live, jnp.where(s == 0, 0, hi >> rs), 0)
    return jnp.cumsum(w0), jnp.cumsum(w1), jnp.cumsum(w2)

def b_scatter(lo, hi, nbits):
    offs = jnp.cumsum(nbits) - nbits
    word = (offs >> 5).astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    bnd = jnp.full(NW, -1, jnp.int32).at[word].max(
        idx, mode="drop", indices_are_sorted=True)
    return jax.lax.cummax(bnd)

def c_gathers(lo, hi, nbits):
    c0, c1, c2 = a_cumsums(lo, hi, nbits)
    offs = jnp.cumsum(nbits) - nbits
    word = (offs >> 5).astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    bnd = jnp.full(NW, -1, jnp.int32).at[word].max(
        idx, mode="drop", indices_are_sorted=True)
    bnd = jax.lax.cummax(bnd)
    g = jnp.maximum(bnd, 0)
    return c0[g], c1[g], c2[g]

from jdeflate_tpu.ops import bitpack
def d_full(lo, hi, nbits):
    return bitpack.pack(lo, hi, nbits, NW)

for name, fn in (("A cumsums(4)", a_cumsums), ("B scatter-max+cummax", b_scatter),
                 ("C A+B+3 gathers", c_gathers), ("D full pack", d_full)):
    t = measure_cycled(sets, fn, iters=4)
    print(f"PACK {name}: {t*1e3:.2f} ms", flush=True)
print("done", flush=True)
