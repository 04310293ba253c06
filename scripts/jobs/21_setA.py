"""Experiment set A: transfers, walk cost model, encode splits, pallas probe."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(3000, exit=True)
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

# --- 1. fresh transfer rates ---
f = jax.jit(lambda s: (jnp.zeros(8 << 20, jnp.uint8) + s.astype(jnp.uint8)))
np.asarray(f(jnp.int32(1)))
for it in range(2):
    t0 = time.perf_counter()
    np.asarray(f(jnp.int32(it + 2)))
    print(f"fresh d2h 8MB: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
for it in range(2):
    a = np.full(8 << 20, it + 1, np.uint8)
    t0 = time.perf_counter()
    y = jnp.asarray(a)
    int(y[0])
    print(f"fresh h2d 8MB: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

# --- setup real stream ---
n = 8 << 20
data = B.make_corpus(n)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
raw, idx = enc.compress(data)
dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                    max_batch_out=1 << 23)
calls = []
orig = I.decode_batch_anchored
I.decode_batch_anchored = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
out = dec.decompress(raw, index=idx)
I.decode_batch_anchored = orig
print("ok", out == data, "calls", len(calls), flush=True)
(words, tb_a, st_a, en_a, ll, dl, win, lanes, nb, oc, up, fs) = calls[0]
lk, le, lp = dk.litlen_attrs()
dkk, de, dp = dk.dist_attrs()
f_tb = jax.jit(lambda l_, d_: (dk.build_tables_batch(l_, lk, le, lp),
                               dk.build_tables_batch(d_, dkk, de, dp)))
ltab, dtab = f_tb(ll, dl)

# --- 2. walk cost model: lanes x steps grid (same total symbols) ---
def walk_var(words_, tb_, st_, en_, steps):
    return dk.anchored_walk(words_, ltab, dtab, tb_, st_, en_, steps=steps)

# synthetic lanes: subdivide each real lane's span into 4 at fake offsets
for steps, mult in [(64, 1), (16, 4), (8, 8)]:
    L = lanes * mult
    stn = np.asarray(st_a); enn = np.asarray(en_a)
    reps = np.repeat(stn, mult)
    # fake: spread starts uniformly inside [st, en) (wrong decode, same cost)
    k = np.tile(np.arange(mult), lanes)
    spans = np.repeat(np.maximum(enn - stn, 0), mult)
    st2 = np.where(reps >= 0, reps + (spans * k) // mult, -1).astype(np.int32)
    en2 = np.where(reps >= 0, reps + (spans * (k + 1)) // mult, 0).astype(np.int32)
    tb2 = np.repeat(np.asarray(tb_a), mult).astype(np.int32)
    st2j, en2j, tb2j = jnp.asarray(st2), jnp.asarray(en2), jnp.asarray(tb2)
    def mk(salt):
        return (words, tb2j + 0 * salt, st2j, en2j)
    t = measure(mk, lambda w, t_, s_, e_: walk_var(w, t_, s_, e_, steps), iters=4)
    print(f"walk steps={steps} lanes={L}: {t*1e3:.1f} ms", flush=True)

# --- 3. encode splits ---
bl, batch = 1 << 16, 16
HALO = C.WINDOW_SIZE; PAD = 272
buf = np.zeros(HALO + batch * bl + PAD, np.uint8)
buf[HALO:HALO + batch * bl] = np.frombuffer(data[:batch * bl], np.uint8)
dev = jnp.asarray(buf)
starts = jnp.arange(batch, dtype=jnp.int32) * bl
ext0 = jax.jit(lambda d: jax.vmap(
    lambda s: jax.lax.dynamic_slice(d, (s,), (HALO + bl + PAD,)))(starts))(dev)
block_len = jnp.full(batch, bl, jnp.int32)
valid_from = jnp.maximum(HALO - starts, 0)

def mke(salt):
    # real data dependence on salt: flip one byte
    return (ext0.at[0, HALO].set(salt.astype(jnp.uint8)),)
for k in (1, 8, 48):
    t = measure(mke, lambda e: lz77.find_matches_batch(
        e, block_len, valid_from, HALO, bl, PAD, k), iters=3)
    print(f"enc find_matches k={k}: {t*1e3:.1f} ms/MB", flush=True)
t = measure(mke, lambda e: lz77.find_matches_batch(
    e, block_len, valid_from, HALO, bl, PAD, 48, exact_ext=False), iters=3)
print(f"enc find_matches k=48 no-exact-ext: {t*1e3:.1f} ms/MB", flush=True)

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
t = measure(mke, sort_only, iters=3)
print(f"enc hash+co-sort x5: {t*1e3:.1f} ms/MB", flush=True)

def sort1_gather(ext_):
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
    (skey,) = jax.lax.sort((key,), dimension=1, num_keys=1)
    spos = (skey & 0x1FFFF).astype(jnp.int32)
    base = (jnp.arange(B_, dtype=jnp.int32) * nh)[:, None]
    fi = (base + spos).reshape(-1)
    g = lambda w: w.reshape(-1)[fi].reshape(B_, nh)
    return skey, g(w0), g(w1), g(w2), g(w3)
t = measure(mke, sort1_gather, iters=3)
print(f"enc sort x1 + 4 gathers: {t*1e3:.1f} ms/MB", flush=True)
print("done-safe", flush=True)

# --- 4. RISKY: pallas 1024-entry table probe (may wedge; last on purpose) ---
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def k2(tabb_ref, idx_ref, out_ref):
    i = idx_ref[:]
    lane = i & 127
    row = i >> 7
    acc = jnp.zeros_like(i)
    for r in range(8):
        trow = tabb_ref[8 * r:8 * r + 8, :]
        g = jnp.take_along_axis(trow, lane, axis=1)
        acc = jnp.where(row == r, g, acc)
    out_ref[:] = acc
tab = np.arange(1024, dtype=np.int32) * 3
tabb = jnp.asarray(np.broadcast_to(tab.reshape(8, 1, 128), (8, 8, 128)).reshape(64, 128))
idx1 = jnp.asarray(np.random.default_rng(1).integers(0, 1024, (8, 128)), jnp.int32)
o2 = pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tabb, idx1)
print("1024-table:", "OK" if np.array_equal(np.asarray(o2), tab[np.asarray(idx1)])
      else "WRONG", flush=True)
