"""Measure package-merge entropy stage: vmapped timing vs old scan path,
plus full-encode device ms and ratio at levels 6 and 9.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2400, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.ops import huffman
from jdeflate_tpu.formats import constants as C

n = 2 << 20
base = B.make_corpus(n)
oracle = B.build_oracle()
osz = {lv: len(B.oracle_size(oracle, base, lv)) for lv in (6, 9)}

# ratio check with PM entropy
for lv in (6, 9):
    enc = De.RawDeflater(level=lv, block_size=1 << 16, batch=16)
    raw, _ = enc.compress(base)
    print(f"PM ratio L{lv}: {len(raw)} ({len(raw)/osz[lv]:.5f}x oracle)",
          flush=True)

# timing: vmapped code_lengths_pm vs code_lengths over realistic group count
G = 128
rng = np.random.default_rng(1)
sets = []
for s in range(2):
    f = np.zeros((G, C.NUM_LITLEN_USED), np.int32)
    for g in range(G):
        k = int(rng.integers(40, 286))
        f[g, rng.permutation(286)[:k]] = rng.integers(1, 2000, k)
    sets.append((jnp.asarray(f),))

def t_old(f):
    return jax.vmap(lambda x: huffman.code_lengths(x, 15))(f)

def t_new(f):
    return jax.vmap(lambda x: huffman.code_lengths_pm(x, 15))(f)

for name, fn in (("scan(L)", t_old), ("pm(L)", t_new)):
    t = measure_cycled(sets, fn, iters=5)
    print(f"CL {name}: {t*1e3:.2f} ms per {G} groups", flush=True)

# full encode device time at level 6 (1 MB segment)
HALO, PAD = De.HALO, De.PAD
bl, batch = 1 << 16, 16
nw = De.words_bound(bl, batch)
esets = []
for shift in (0, 1):
    d = bytearray(base[:1 << 20])
    if shift:
        for p in range(100, len(d), 8192):
            d[p] ^= 1
    buf = np.zeros(HALO + batch * bl + PAD, np.uint8)
    buf[HALO:HALO + batch * bl] = np.frombuffer(bytes(d), np.uint8)[:batch * bl]
    esets.append((jnp.asarray(buf),))

def s_full(data):
    return De.encode_batch_impl(data, jnp.int32(0), jnp.int32(batch * bl),
                                jnp.int32(0), jnp.int32(-1), bl, batch,
                                6, nw)
t = measure_cycled(esets, s_full, iters=3)
print(f"ENC full(pm): {t*1e3:.1f} ms/MB", flush=True)
print("done", flush=True)
