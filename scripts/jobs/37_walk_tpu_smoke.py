"""Smoke + timing for the Pallas walk kernel on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1800, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I

n = 8 << 20
data = B.make_corpus(n)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
t0 = time.perf_counter()
raw, idx = enc.compress(data)
print("compressed", len(raw), "in", round(time.perf_counter() - t0, 2), "s",
      flush=True)

dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=512,
                    max_batch_out=1 << 23)
calls = []
orig = I.decode_batch_windows
def spy(*a, **k):
    r = orig(*a, **k)
    calls.append((a, k))
    return r
I.decode_batch_windows = spy
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
print("decompress wall", round(time.perf_counter() - t0, 2), "s ok",
      out == data, "calls", len(calls), flush=True)
I.decode_batch_windows = orig
if out != data:
    sys.exit(1)

args = calls[0][0]
words, pe_word0, pe_tab, alanes, ll, dl, win, hist = args[:8]
npe, nb, oc, up = args[8], args[9], args[10], args[11]
print("npe", npe, "ne", nb, "oc", oc, "use_pallas", up, flush=True)

def mk(salt):
    return (words, pe_word0 + 0 * salt, pe_tab, alanes, ll, dl, win)
def st(w, p0, pt, al, l_, d_, wn):
    return I.decode_batch_windows(w, p0, pt, al, l_, d_, wn, hist,
                                  npe, nb, oc, up)
t = measure(mk, st, iters=4)
print(f"TRUE decode_batch_windows: {t*1e3:.1f} ms for {oc} out "
      f"-> {oc/t/1e9:.2f} GB/s", flush=True)

# stage split: walk only
from jdeflate_tpu.ops import walk as wk
import jax.numpy as jnp
PE = wk.PE_LANES
def st_walk(w, p0, pt, al, l_, d_, wn):
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
    tok, meta = wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                            t1r, t2ar, t2br, t2cr, npe * wk.PE_ROWS)
    return tok, meta
t = measure(mk, st_walk, iters=4)
print(f"TRUE walk(prep+kernel): {t*1e3:.1f} ms", flush=True)
print("done", flush=True)
