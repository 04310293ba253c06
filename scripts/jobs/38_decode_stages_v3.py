"""True device-time breakdown of the windowed decode path (distinct-input
cycling; see scripts/devtime.py)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1800, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import walk as wk

n = 8 << 20
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=512,
                    max_batch_out=1 << 23)

sets = []
total_out = 0
base = B.make_corpus(n)
for seed_shift in (0, 1):
    if seed_shift:
        d2 = bytearray(base)
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
        data = bytes(d2)
    else:
        data = base
    raw, idx = enc.compress(data)
    calls = []
    orig = I.decode_batch_windows
    I.decode_batch_windows = lambda *a, **k: (calls.append(a),
                                              orig(*a, **k))[1]
    out = dec.decompress(raw, index=idx)
    I.decode_batch_windows = orig
    assert out == data
    a = calls[0]
    sets.append(a[:8])
    print("variant", seed_shift, "npe", a[8], "ne", a[9], "oc", a[10],
          flush=True)
    npe, ne, oc, up = a[8], a[9], a[10], a[11]
    total_out = oc

def full(w, p0, pt, al, l_, d_, wn, h):
    return I.decode_batch_windows(w, p0, pt, al, l_, d_, wn, h,
                                  npe, ne, oc, True)
t = measure_cycled(sets, full, iters=8)
print(f"DEV decode_batch_windows: {t*1e3:.2f} ms for {oc} "
      f"-> {oc/t/1e9:.2f} GB/s", flush=True)

# --- stage: walk prep + kernel ---
PE = wk.PE_LANES
def walk_only(w, p0, pt, al, l_, d_, wn, h):
    t1, t2a, t2b, t2c = wk.build_entry_tables(l_, d_)
    def rows(tab):
        p = jnp.take(tab, pt, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)
    t1r, t2ar, t2br, t2cr = rows(t1), rows(t2a), rows(t2b), rows(t2c)
    seg = jax.vmap(
        lambda s: jax.lax.dynamic_slice(w, (s,), (PE + 8,)))(
        jnp.maximum(p0, 0))
    seg0 = seg[:, 0:PE].reshape(-1, 128)
    seg1 = seg[:, 1:PE + 1].reshape(-1, 128)
    seg2 = seg[:, 2:PE + 2].reshape(-1, 128)
    lanebit = (jnp.maximum(p0, 0)[:, None]
               + jnp.arange(PE, dtype=jnp.int32)[None, :]) * 32
    start_rel = jnp.where(al >= 0, al - lanebit, -1).astype(jnp.int32)
    return wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                       t1r, t2ar, t2br, t2cr, npe * wk.PE_ROWS)
t = measure_cycled(sets, walk_only, iters=8)
print(f"DEV walk prep+kernel: {t*1e3:.2f} ms", flush=True)

# --- stage: tables+seg prep only ---
def prep_only(w, p0, pt, al, l_, d_, wn, h):
    t1, t2a, t2b, t2c = wk.build_entry_tables(l_, d_)
    def rows(tab):
        p = jnp.take(tab, pt, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)
    t1r, t2ar, t2br, t2cr = rows(t1), rows(t2a), rows(t2b), rows(t2c)
    seg = jax.vmap(
        lambda s: jax.lax.dynamic_slice(w, (s,), (PE + 8,)))(
        jnp.maximum(p0, 0))
    return t1r, t2ar, t2br, t2cr, seg
t = measure_cycled(sets, prep_only, iters=8)
print(f"DEV prep only: {t*1e3:.2f} ms", flush=True)

# --- stage: glue + expand given walk outputs ---
walked = []
for s in sets:
    tokmeta = jax.jit(walk_only)(*s)
    walked.append((tokmeta[0], tokmeta[1], s[6]))
def glue_expand(tok, meta, wn):
    from jdeflate_tpu.ops import expand2 as ex2
    nrows = npe * wk.PE_ROWS
    tok_lm = wk.tok_to_lane_major(tok, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == wk.TOK_LIT, 1,
                     jnp.where(kind2 == wk.TOK_MATCH,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    tok_ann = wk.annotate_lit_runs(tok_lm)
    return ex2.expand_tokens(tok_ann, outlen, wn, oc)
t = measure_cycled(walked, glue_expand, iters=8)
print(f"DEV glue+expand: {t*1e3:.2f} ms", flush=True)

# --- stage: expand kernel alone ---
pre = []
for tok, meta, wn in walked:
    nrows = npe * wk.PE_ROWS
    tok_lm = wk.tok_to_lane_major(tok, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == wk.TOK_LIT, 1,
                     jnp.where(kind2 == wk.TOK_MATCH,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    tok_ann = wk.annotate_lit_runs(tok_lm)
    pre.append((jax.device_put(tok_ann), jax.device_put(outlen),
                jax.device_put(wn)))
def expand_only(tok_ann, outlen, wn):
    from jdeflate_tpu.ops import expand2 as ex2
    return ex2.expand_tokens(tok_ann, outlen, wn, oc)
t = measure_cycled(pre, expand_only, iters=8)
print(f"DEV expand kernel(+laneoff): {t*1e3:.2f} ms", flush=True)
print("done", flush=True)
