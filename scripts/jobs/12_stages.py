import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np

def log(*a):
    print(*a, flush=True)

import bench as B
data = B.make_corpus(4 << 20)

from jdeflate_tpu.codec.deflate import RawDeflater, encode_batch_impl, words_bound, HALO, PAD
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import lz77
from jdeflate_tpu.codec import levels as levels_mod
sys.path.insert(0, "/root/repo/scripts")
import truetime as tt

bl, batch, level = 1 << 16, 16, 6
cfg = levels_mod.get_level(level)
seg = bl * batch
buf = np.zeros(HALO + seg + PAD, np.uint8)
buf[HALO:HALO + seg] = np.frombuffer(data[:seg], np.uint8)
dev = jnp.asarray(buf)
row = HALO + bl + PAD

def mk(salt):
    d = dev.at[HALO].set((salt & 0xFF).astype(jnp.uint8))
    ext = jax.vmap(lambda s: jax.lax.dynamic_slice(d, (s,), (row,)))(
        jnp.arange(batch, dtype=jnp.int32) * bl)
    return (ext,)

bl_arr = np.full(batch, bl, np.int32)
vf = np.full(batch, HALO, np.int32)

def stage_match(ext):
    return lz77.find_matches_batch(
        ext, jnp.asarray(bl_arr), jnp.asarray(vf), HALO, bl, PAD,
        max(cfg.probes, 1), cfg.rerank)

t = tt.measure(mk, stage_match, iters=4)
log(f"match-find: {t*1e3:.1f} ms / {seg>>20} MB")

def stage_parse(ext):
    length, dist = lz77.find_matches_batch(
        ext, jnp.asarray(bl_arr), jnp.asarray(vf), HALO, bl, PAD,
        max(cfg.probes, 1), cfg.rerank)
    take = lz77.parse_take(length, dist, jnp.asarray(bl_arr), cfg.lazy,
                           cfg.good_length)
    return lz77.token_marks_batch(length, take, jnp.asarray(bl_arr), bl)

t2 = tt.measure(mk, stage_parse, iters=4)
log(f"match+parse walk: {t2*1e3:.1f} ms")

nw = words_bound(bl, batch)
def mk1(salt):
    return (dev.at[HALO].set((salt & 0xFF).astype(jnp.uint8)),)
def stage_full2(d):
    return encode_batch_impl(d, jnp.int32(0), jnp.int32(seg), jnp.int32(0),
                             jnp.int32(batch - 1), bl, batch, level, nw)
t3 = tt.measure(mk1, stage_full2, iters=4)
log(f"full encode batch: {t3*1e3:.1f} ms -> {seg/t3/1e9:.3f} GB/s")

# decode stage timing on real compressed stream
enc = RawDeflater(level=level, block_size=bl, batch=batch)
raw, idx = enc.compress(data)
dec = I.RawInflater(max_batch_bits=1 << 24, max_batch_blocks=64,
                    max_batch_out=1 << 22)
out = dec.decompress(raw, index=idx)
log("decode warm ok", out == data)
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
dt = time.perf_counter() - t0
log(f"decode steady: {dt*1e3:.0f} ms -> {len(data)/dt/1e9:.3f} GB/s")
t0 = time.perf_counter()
raw2, _ = enc.compress(data)
dt = time.perf_counter() - t0
log(f"encode steady: {dt*1e3:.0f} ms -> {len(data)/dt/1e9:.3f} GB/s")
