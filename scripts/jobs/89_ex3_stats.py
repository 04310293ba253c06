"""Stats on the real bench batch: sub-round counts + isolated expand3 time."""
import os
os.environ["EX3_STATS"] = "1"
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import walk as wk
from jdeflate_tpu.ops import expand3 as ex3

data = make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                  max_batch_out=1 << 23)
raw, idx = enc.compress(data)

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
        out = dec.decompress(r2, index=i2)
        assert out == v
    finally:
        I.decode_batch_windows = orig
    a = calls[0]
    (words, pe_word0, pe_tab, alanes, ll, dl, halo, hist) = a[:8]
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
    tok, meta = wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                            rows(t1), rows(t2a), rows(t2b), rows(t2c), nrows)
    tok_lm = wk.tok_to_lane_major(tok, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == 1, 1,
                     jnp.where(kind2 == 2,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    sets.append((tok_lm, outlen, halo))
    if pert == 0:
        o2, p2, e2, dbg = ex3.expand_tokens_dbg(tok_lm, outlen, halo, oc)
        row = np.asarray(dbg[40])
        print(f"batches={row[0]} subrounds={row[1]} items={row[2]} "
              f"avg_nit={row[1]/max(row[0],1):.1f} "
              f"avg_n={row[2]/max(row[0],1):.1f} err={int(e2)}", flush=True)

OC = oc
def stage(tok_lm, outlen, halo):
    o, p, e = ex3.expand_tokens(tok_lm, outlen, halo, OC)
    return o, p, e

t = measure_cycled(sets, stage, iters=4)
print(f"expand3 alone: {t*1e3:.2f} ms per 2MB batch "
      f"({OC / t / 1e9:.3f} GB/s)", flush=True)
print("done", flush=True)
