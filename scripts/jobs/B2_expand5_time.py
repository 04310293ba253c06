"""expand5 (parallel plan/propagate/resolve) vs expand2 (serial walk) on the
real bench batch (rerun): correctness + per-stage device time."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.ops import walk as wk
from jdeflate_tpu.ops import expand2 as ex2
from jdeflate_tpu.ops import expand5 as ex5

data = make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                  max_batch_out=1 << 23)

sets = []
OC = None
for pert in (0, 1):
    d2 = bytearray(data)
    if pert:
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
    v = bytes(d2)
    r2, i2 = enc.compress(v)
    dec.capture_calls = True
    out = dec.decompress(r2, index=i2)
    assert out == v
    call = dec.last_calls[0]
    (words_full, metas_dev, row, win, npe, nb, oc, wwords, up, engine) = call
    meta = np.asarray(metas_dev)[int(row)]
    PE = wk.PE_LANES
    o = 2
    word_lo, hist = int(meta[0]), int(meta[1])
    pe_word0 = jnp.asarray(meta[o:o + npe]); o += npe
    pe_tab = jnp.asarray(meta[o:o + npe]); o += npe
    alanes = jnp.asarray(meta[o:o + npe * PE].reshape(npe, PE)); o += npe * PE
    ll = jnp.asarray(meta[o:o + nb * 288].reshape(nb, 288)); o += nb * 288
    dl = jnp.asarray(meta[o:o + nb * 32].reshape(nb, 32))
    words = jax.lax.dynamic_slice(words_full, (word_lo,), (wwords,))
    t1, t2a, t2b, t2c = wk.build_entry_tables(ll, dl)
    def rows(tab):
        p = jnp.take(tab, pe_tab, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)
    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(
        words, (s,), (PE + 8,)))(jnp.maximum(pe_word0, 0))
    seg0 = seg[:, 0:PE].reshape(-1, 128)
    seg1 = seg[:, 1:PE + 1].reshape(-1, 128)
    seg2 = seg[:, 2:PE + 2].reshape(-1, 128)
    lanebit = (jnp.maximum(pe_word0, 0)[:, None]
               + jnp.arange(PE, dtype=jnp.int32)[None, :]) * 32
    start_rel = jnp.where(alanes >= 0, alanes - lanebit, -1).astype(jnp.int32)
    nrows = npe * wk.PE_ROWS
    tok, mta = wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                           rows(t1), rows(t2a), rows(t2b), rows(t2c), nrows)
    tok_lm = wk.tok_to_lane_major(tok, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == 1, 1,
                     jnp.where(kind2 == 2,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    halo = win  # first batch: zero halo
    sets.append((tok_lm, outlen, halo))
    OC = oc

print("batch: L=%d S=%d oc=%d" % (sets[0][0].shape[0],
                                  sets[0][0].shape[1], OC), flush=True)

# ---- correctness: expand5 vs expand2 on set 0 ----
tok_lm, outlen, halo = sets[0]
tok_ann = wk.annotate_lit_runs(tok_lm)
o2, p2 = ex2.expand_tokens(tok_ann, outlen, halo, OC)
o5, p5, e5 = ex5.expand_tokens(tok_lm, outlen, halo, OC)
n = int(p2)
a2 = np.asarray(o2[:n]); a5 = np.asarray(o5[:n])
mism = int(np.sum(a2 != a5))
print(f"produced ex2={int(p2)} ex5={int(p5)} err5={int(e5)} "
      f"mismatch_bytes={mism}", flush=True)
if mism:
    i = int(np.argmax(a2 != a5))
    print("first mismatch at", i, a2[max(0,i-4):i+8], a5[max(0,i-4):i+8])

# ---- stage times ----
def s_ex2(tok_lm, outlen, halo):
    ta = wk.annotate_lit_runs(tok_lm)
    return ex2.expand_tokens(ta, outlen, halo, OC)

def s_attrs(tok_lm, outlen, halo):
    return ex5.slot_attrs(tok_lm, outlen)

def s_seed(tok_lm, outlen, halo):
    off, seed = ex5.slot_attrs(tok_lm, outlen)
    return ex5.seed_scatter_ref(off, seed, OC)

def s_prop(tok_lm, outlen, halo):
    off, seed = ex5.slot_attrs(tok_lm, outlen)
    S = ex5.seed_scatter_ref(off, seed, OC)
    return ex5.propagate(S)

def s_full5(tok_lm, outlen, halo):
    return ex5.expand_tokens(tok_lm, outlen, halo, OC)

import functools

def s_seedmm(tok_lm, outlen, halo):
    off, seed16 = ex5.slot_attrs16(tok_lm, outlen)
    return ex5.seed_scatter_mm(off, seed16, OC)

def s_spill(tok_lm, outlen, halo):
    off, seed16 = ex5.slot_attrs16(tok_lm, outlen)
    S16, serr = ex5.seed_scatter_mm(off, seed16, OC)
    return ex5.spill_pass(tok_lm, outlen, S16.reshape(-1)[:OC], OC)

for name, fn in [("seed_mm_only", s_seedmm), ("seed+spill", s_spill)]:
    t = measure_cycled(sets, fn, iters=4)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)

res_jit = jax.jit(functools.partial(ex5.resolve_tpu, out_cap=OC))
off0, seed0 = ex5.slot_attrs(sets[0][0], sets[0][1])
off1, seed1 = ex5.slot_attrs(sets[1][0], sets[1][1])
P0 = ex5.propagate(ex5.seed_scatter_ref(off0, seed0, OC)).reshape(-1, 128)
P1 = ex5.propagate(ex5.seed_scatter_ref(off1, seed1, OC)).reshape(-1, 128)
rsets = [(P0, sets[0][2]), (P1, sets[1][2])]

def s_resolve(P, halo):
    return res_jit(P, halo)

t = measure_cycled(rsets, s_resolve, iters=4)
print(f"ex5_resolve_only: {t*1e3:.2f} ms  ({OC/t/1e9:.3f} GB/s)", flush=True)

for name, fn in [("ex2_total", s_ex2), ("ex5_attrs", s_attrs),
                 ("ex5_+seedref", s_seed), ("ex5_+prop", s_prop),
                 ("ex5_total", s_full5)]:
    t = measure_cycled(sets, fn, iters=4)
    print(f"{name}: {t*1e3:.2f} ms  ({OC/ t / 1e9:.3f} GB/s)", flush=True)
