"""Post-matmul+pairing check: encode device ms (level 6), ratio L6/L9,
roundtrip through device decode path on TPU.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(3000, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import inflate as I

n = 2 << 20
base = B.make_corpus(n)
oracle = B.build_oracle()

dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=512,
                    max_batch_out=1 << 23)
for lv in (1, 6, 9):
    osz = len(B.oracle_size(oracle, base, lv))
    enc = De.RawDeflater(level=lv, block_size=1 << 16, batch=16)
    raw, idx = enc.compress(base)
    out = dec.decompress(raw, index=idx)
    print(f"L{lv}: {len(raw)} vs {osz} = {len(raw)/osz:.5f}x "
          f"roundtrip={'OK' if out == base else 'FAIL'}", flush=True)

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
print(f"ENC full(v2): {t*1e3:.1f} ms/MB", flush=True)
print("done", flush=True)
