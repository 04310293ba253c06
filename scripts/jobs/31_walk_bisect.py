"""Bisect the anchored_walk slowness: time stripped-down variants."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1200, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import decode as dk

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
print("lanes", lanes, "nblocks", nb, "out_cap", oc,
      "words", words.shape, flush=True)

lk, le, lp = dk.litlen_attrs()
dkk, de, dp = dk.dist_attrs()
f_tb = jax.jit(lambda l_, d_: (dk.build_tables_batch(l_, lk, le, lp),
                               dk.build_tables_batch(d_, dkk, de, dp)))
ltab, dtab = f_tb(ll, dl)
print("ltab", ltab.shape, flush=True)

# full walk (reference point)
def mk(salt):
    return (words, tb_a + 0 * salt, st_a, en_a)
def st_walk(w, t_, s_, e_):
    return dk.anchored_walk(w, ltab, dtab, t_, s_, e_)
t = measure(mk, st_walk, iters=4)
print(f"walk full: {t*1e3:.1f} ms", flush=True)

# variant A: scan with ONLY the 5 gathers + trivial combine (no where soup)
def st_a5(w, tb, s, e):
    def step(carry, _):
        p = carry
        pw = (p >> 5).astype(jnp.int32)
        sh = (p & 31).astype(jnp.uint32)
        w0 = w[pw]; w1 = w[pw + 1]; w2 = w[pw + 2]
        ns = jnp.uint32(32) - sh
        lo = (w0 >> sh) | jnp.where(sh == 0, 0, w1 << ns)
        hi = (w1 >> sh) | jnp.where(sh == 0, 0, w2 << ns)
        e1 = ltab[tb + dk.rev15(lo & jnp.uint32(dk.TABLE_SIZE - 1)).astype(jnp.int32)]
        c1 = (e1 & 31).astype(jnp.int32)
        e2 = dtab[tb + dk.rev15(dk._fld(lo, hi, c1, dk.TABLE_BITS)).astype(jnp.int32)]
        c2 = (e2 & 31).astype(jnp.int32)
        pn = p + c1 + c2
        pn = jnp.where(pn > e, s, pn)   # keep positions in range
        return pn, (c1 + c2)
    _, outs = jax.lax.scan(step, s, None, length=64)
    return outs
t = measure(mk, st_a5, iters=4)
print(f"walk A (5 gathers, no stack soup): {t*1e3:.1f} ms", flush=True)

# variant B: same but fori_loop with accumulator (no stacking)
def st_b(w, tb, s, e):
    def body(i, carry):
        p, acc = carry
        pw = (p >> 5).astype(jnp.int32)
        sh = (p & 31).astype(jnp.uint32)
        w0 = w[pw]; w1 = w[pw + 1]; w2 = w[pw + 2]
        ns = jnp.uint32(32) - sh
        lo = (w0 >> sh) | jnp.where(sh == 0, 0, w1 << ns)
        hi = (w1 >> sh) | jnp.where(sh == 0, 0, w2 << ns)
        e1 = ltab[tb + dk.rev15(lo & jnp.uint32(dk.TABLE_SIZE - 1)).astype(jnp.int32)]
        c1 = (e1 & 31).astype(jnp.int32)
        e2 = dtab[tb + dk.rev15(dk._fld(lo, hi, c1, dk.TABLE_BITS)).astype(jnp.int32)]
        c2 = (e2 & 31).astype(jnp.int32)
        pn = p + c1 + c2
        pn = jnp.where(pn > e, s, pn)
        return pn, acc + c1
    _, acc = jax.lax.fori_loop(0, 64, body, (s, jnp.zeros_like(s)))
    return acc
t = measure(mk, st_b, iters=4)
print(f"walk B (fori, no stacking): {t*1e3:.1f} ms", flush=True)

# variant C: only ONE gather per step (table), positions fake-advance
def st_c(w, tb, s, e):
    def body(i, carry):
        p, acc = carry
        e1 = ltab[tb + (p & jnp.int32(dk.TABLE_SIZE - 1))]
        c1 = (e1 & 31).astype(jnp.int32)
        return (p + c1 + 1, acc + c1)
    _, acc = jax.lax.fori_loop(0, 64, body, (s, jnp.zeros_like(s)))
    return acc
t = measure(mk, st_c, iters=4)
print(f"walk C (1 gather/step fori): {t*1e3:.1f} ms", flush=True)

# variant D: the real f_eval in a scan but WITHOUT stacked outputs
def st_d(w, tb, s, e):
    def step(carry, _):
        p, acc = carry
        nxt, outlen, lit, dist, invalid, is_eob = dk.f_eval(w, ltab, dtab, tb, jnp.maximum(p, 0))
        pn = jnp.where(nxt > e, s, nxt)
        return (pn, acc + outlen + lit + dist), None
    (pf, acc), _ = jax.lax.scan(step, (s, jnp.zeros_like(s)), None, length=64)
    return acc
t = measure(mk, st_d, iters=4)
print(f"walk D (f_eval scan, no stacking): {t*1e3:.1f} ms", flush=True)

print("done", flush=True)
