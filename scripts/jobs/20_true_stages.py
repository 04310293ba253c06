"""True device-compute timings (fori_loop + salt + scalar readback)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2400, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import decode as dk
from jdeflate_tpu.ops import lz77
from jdeflate_tpu.formats import constants as C

n = 8 << 20
data = B.make_corpus(n)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
raw, idx = enc.compress(data)
print("compressed", len(raw), flush=True)

dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                    max_batch_out=1 << 23)
calls = []
orig = I.decode_batch_anchored
I.decode_batch_anchored = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
out = dec.decompress(raw, index=idx)
I.decode_batch_anchored = orig
print("ok", out == data, "calls", len(calls), flush=True)
(words, tb_a, st_a, en_a, ll, dl, win, lanes, nb, oc, use_pallas, fs) = calls[0]

lk, le, lp = dk.litlen_attrs()
dkk, de, dp = dk.dist_attrs()

def mk(salt):
    return (words, ll + 0 * salt, dl)
def st_tb(words_, ll_, dl_):
    return (dk.build_tables_batch(ll_, lk, le, lp),
            dk.build_tables_batch(dl_, dkk, de, dp))
t = measure(mk, st_tb, iters=4)
print(f"TRUE dec table build: {t*1e3:.1f} ms", flush=True)

f_tb = jax.jit(lambda l_, d_: st_tb(None, l_, d_))
ltab, dtab = f_tb(ll, dl)
def mk2(salt):
    return (words, tb_a + 0 * salt, st_a, en_a)
def st_walk(words_, tb_, st_, en_):
    return dk.anchored_walk(words_, ltab, dtab, tb_, st_, en_)
t = measure(mk2, st_walk, iters=4)
print(f"TRUE dec anchored walk: {t*1e3:.1f} ms", flush=True)

outlen, lit, dist, _ = jax.jit(st_walk)(words, tb_a, st_a, en_a)
ol = outlen.reshape(-1); li = lit.reshape(-1); di = dist.reshape(-1)
from jdeflate_tpu.codec.inflate import _assemble_pallas
def mk3(salt):
    return (ol + 0 * salt, li, di)
def st_asm(ol_, li_, di_):
    return _assemble_pallas(ol_, li_, di_, win, oc, fs, nb)
t = measure(mk3, st_asm, iters=4)
print(f"TRUE dec assemble(pallas): {t*1e3:.1f} ms", flush=True)

# decode e2e device program
from jdeflate_tpu.codec.inflate import decode_batch_anchored as dba
def mk4(salt):
    return (words, tb_a + 0 * salt, st_a, en_a, ll, dl, win)
def st_dec(w, t_, s_, e_, ll_, dl_, win_):
    return dba(w, t_, s_, e_, ll_, dl_, win_, lanes, nb, oc, True, fs)
t = measure(mk4, st_dec, iters=4)
print(f"TRUE dec whole batch (8MB out): {t*1e3:.1f} ms -> {n/t/1e9:.2f} GB/s", flush=True)

# ---- encode ----
bl, batch = 1 << 16, 16
HALO = C.WINDOW_SIZE; PAD = 272
buf = np.zeros(HALO + batch * bl + PAD, np.uint8)
buf[HALO:HALO + batch * bl] = np.frombuffer(data[:batch * bl], np.uint8)
dev = jnp.asarray(buf)
starts = jnp.arange(batch, dtype=jnp.int32) * bl
ext = jax.jit(lambda d: jax.vmap(
    lambda s: jax.lax.dynamic_slice(d, (s,), (HALO + bl + PAD,)))(starts))(dev)
block_len = jnp.full(batch, bl, jnp.int32)
valid_from = jnp.maximum(HALO - starts, 0)

def mk5(salt):
    return (ext ^ (salt.astype(jnp.uint8) & 0),)
def st_mf(e):
    return lz77.find_matches_batch(e, block_len, valid_from, HALO, bl, PAD, 48)
t = measure(mk5, st_mf, iters=3)
print(f"TRUE enc find_matches(48): {t*1e3:.1f} ms per 1MB", flush=True)

def sort_only(ext_):
    B_ = ext_.shape[0]; nh = HALO + bl
    e32 = ext_.astype(jnp.uint32)
    def wcol(off):
        c = e32[:, off:off + nh]; c1 = e32[:, off+1:off+1+nh]
        c2 = e32[:, off+2:off+2+nh]; c3 = e32[:, off+3:off+3+nh]
        return c | (c1 << 8) | (c2 << 16) | (c3 << 24)
    w0, w1, w2, w3 = wcol(0), wcol(4), wcol(8), wcol(12)
    h = (w0 * lz77.HASH_MULT) >> (32 - lz77.HASH_BITS)
    posb = jnp.broadcast_to(jnp.arange(nh, dtype=jnp.uint32)[None, :], (B_, nh))
    key = (h << 17) | posb
    return jax.lax.sort((key, w0, w1, w2, w3), dimension=1, num_keys=1)
t = measure(mk5, sort_only, iters=3)
print(f"TRUE enc hash+co-sort: {t*1e3:.1f} ms per 1MB", flush=True)

# full encode batch
from jdeflate_tpu.codec import deflate as De
nw = De.words_bound(bl, batch)
def mk6(salt):
    return (dev ^ (salt.astype(jnp.uint8) & 0),)
def st_enc(d):
    return De.encode_batch_impl(d, jnp.int32(0), jnp.int32(batch * bl),
                                jnp.int32(0), jnp.int32(-1), bl, batch, 6, nw)
t = measure(mk6, st_enc, iters=3)
print(f"TRUE enc whole batch: {t*1e3:.1f} ms per 1MB -> {batch*bl/t/1e9:.3f} GB/s", flush=True)
print("done", flush=True)
