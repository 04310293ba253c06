"""v4.2: scale correctness + real-batch stats/time + synthetic time."""
import os
os.environ["EX3_STATS"] = "1"
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from devtime import measure_cycled
from jdeflate_tpu.ops import expand3 as ex3

# --- synthetic scale correctness (same as job 87) ---
rng = np.random.default_rng(5)
L = 131072
OC = 1 << 21
tok = np.zeros((L, 32), np.uint32)
outlen = np.zeros(L, np.int32)
total = 0
for i in range(L):
    if total >= OC - 600:
        break
    n = int(rng.integers(1, 6))
    s = 0; col = 0
    for _ in range(n):
        if col >= 30: break
        if total + s < 8 or rng.random() < 0.5:
            k = int(rng.integers(1, 5))
            for _ in range(k):
                if col >= 30: break
                tok[i, col] = (1 << 30) | int(rng.integers(0, 256))
                col += 1; s += 1
        else:
            d = int(rng.integers(1, min(total + s, 32768) + 1))
            ln = int(rng.integers(3, 259))
            tok[i, col] = (2 << 30) | ln | ((d - 1) << 9)
            col += 1; s += ln
    outlen[i] = s
    total += s
halo = rng.integers(0, 256, ex3.HALO).astype(np.uint8)
ref = bytearray()
for i in range(L):
    for t in tok[i]:
        t = int(t)
        k = (t >> 30) & 3
        if k == 0: break
        if k == 1: ref.append(t & 0xFF)
        else:
            ln = t & 0x1FF; d = ((t >> 9) & 0x7FFF) + 1
            for _ in range(ln):
                p = len(ref) - d
                ref.append(ref[p] if p >= 0 else halo[p])
ref = bytes(ref)
out, produced, kerr, dbg = ex3.expand_tokens_dbg(
    jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo), OC)
got = bytes(np.asarray(out)[:int(produced)])
nd = sum(1 for i in range(min(len(got), len(ref))) if got[i] != ref[i])
row = np.asarray(dbg[40])
print(f"scale: produced={int(produced)}/{len(ref)} kerr={int(kerr)} "
      f"ndiffs={nd}", flush=True)
print(f"stats: batches={row[0]} subrounds={row[1]} items={row[2]}", flush=True)

# --- real bench batch ---
from bench import make_corpus
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import walk as wk

data = make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                  max_batch_out=1 << 23)
sets = []
for pert in (0, 1):
    d2 = bytearray(data)
    if pert:
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
    v = bytes(d2)
    r2, i2 = enc.compress(v)
    calls = []
    orig = I.decode_batch_windows
    I.decode_batch_windows = lambda *a, **k: (calls.append(a),
                                              orig(*a, **k))[1]
    try:
        outv = dec.decompress(r2, index=i2)
        print(f"roundtrip pert={pert}: {outv == v}", flush=True)
    finally:
        I.decode_batch_windows = orig
    a = calls[0]
    (words, pe_word0, pe_tab, alanes, ll, dl, halo2, hist) = a[:8]
    npe, ne, oc, up = a[8:12]
    PE = wk.PE_LANES
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
    tk, meta = wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                           rows(t1), rows(t2a), rows(t2b), rows(t2c), nrows)
    tok_lm = wk.tok_to_lane_major(tk, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == 1, 1,
                     jnp.where(kind2 == 2,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    ol = jnp.sum(len2, axis=1)
    sets.append((tok_lm, ol, halo2))
    if pert == 0:
        o2, p2, e2, dbg2 = ex3.expand_tokens_dbg(tok_lm, ol, halo2, oc)
        r2_ = np.asarray(dbg2[40])
        print(f"real stats: batches={r2_[0]} subrounds={r2_[1]} "
              f"items={r2_[2]} err={int(e2)}", flush=True)

OC2 = oc
def stage(tok_lm, ol, h):
    return ex3.expand_tokens(tok_lm, ol, h, OC2)

t = measure_cycled(sets, stage, iters=4)
print(f"expand3 v4.2 real batch: {t*1e3:.2f} ms ({OC2/t/1e9:.3f} GB/s)",
      flush=True)
print("done", flush=True)
