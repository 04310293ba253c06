import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1800, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import decode as dk
from jdeflate_tpu.ops import expand as ex

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
(words, tb_a, st_a, en_a, ll, dl, win, lanes, nb, oc, up, fs) = calls[0]
lk, le, lp = dk.litlen_attrs()
dkk, de, dp = dk.dist_attrs()
ltab, dtab = jax.jit(lambda l_, d_: (dk.build_tables_batch(l_, lk, le, lp),
                                     dk.build_tables_batch(d_, dkk, de, dp)))(ll, dl)
outlen, lit, dist, _ = jax.jit(
    lambda: dk.anchored_walk(words, ltab, dtab, tb_a, st_a, en_a))()
ol = outlen.reshape(-1); li = lit.reshape(-1); di = dist.reshape(-1)
S = ol.shape[0]
HALO = I.HALO

def pieces(ol_, li_, di_):
    off = HALO + jnp.cumsum(ol_) - ol_
    produced = jnp.sum(ol_)
    rows_n = (HALO + oc + ex.REGION) // 128 + 2
    N = rows_n * 128
    val = jnp.zeros(N, jnp.uint8).at[:HALO].set(win)
    is_tok = ol_ > 0
    is_lit = is_tok & (di_ == 0)
    val = val.at[jnp.where(is_lit, off, N)].set(li_.astype(jnp.uint8), mode="drop")
    return off, produced, val

t = measure(lambda s: (ol.at[0].set(s % 2), li, di),
            lambda a, b, c: pieces(a, b, c), iters=4)
print(f"asm: cumsum+literal scatter: {t*1e3:.1f} ms", flush=True)

off, produced, val = jax.jit(pieces)(ol, li, di)
def sort_part(ol_, di_, off_):
    slot = jnp.arange(S, dtype=jnp.int32)
    is_m = di_ > 0
    key = jnp.where(is_m, slot, S)
    return jax.lax.sort((key, off_, di_, ol_), num_keys=1)
t = measure(lambda s: (ol.at[0].set(s % 2), di, off),
            lambda a, b, c: sort_part(a, b, c), iters=4)
print(f"asm: match-compact sort: {t*1e3:.1f} ms", flush=True)

def compact_part(ol_, di_, off_):
    is_m = di_ > 0
    mi = is_m.astype(jnp.int32)
    rank = jnp.cumsum(mi) - mi
    tgt = jnp.where(is_m, rank, S)
    m_off = jnp.zeros(S + 1, jnp.int32).at[tgt].set(off_, mode="drop")[:S]
    m_d = jnp.zeros(S + 1, jnp.int32).at[tgt].set(di_, mode="drop")[:S]
    m_len = jnp.zeros(S + 1, jnp.int32).at[tgt].set(ol_, mode="drop")[:S]
    return m_off, m_d, m_len, rank
t = measure(lambda s: (ol.at[0].set(s % 2), di, off),
            lambda a, b, c: compact_part(a, b, c), iters=4)
print(f"asm: match-compact scatter: {t*1e3:.1f} ms", flush=True)

skey, m_off, m_d, m_len = jax.jit(sort_part)(ol, di, off)
trows = S // 32 + ex.TROWS + 2
def kern_part(m_off_, m_d_, m_len_, val_):
    toks4 = jnp.zeros((trows * 32, 4), jnp.int32)
    toks4 = toks4.at[:S, 0].set(m_off_).at[:S, 1].set(m_d_).at[:S, 2].set(m_len_)
    toks4 = toks4.reshape(trows, 128)
    fsl = fs.astype(jnp.int32)
    t0s = jnp.searchsorted(skey, fsl).astype(jnp.int32)
    out_ss = off[jnp.clip(fsl, 0, S - 1)]
    out_ss = jnp.where(fsl >= S, HALO + produced, out_ss)
    ranges = jnp.stack([t0s[:-1], t0s[1:], out_ss[:-1],
                        jnp.zeros(nb, jnp.int32)], axis=1).reshape(-1)
    return ex.expand_matches(val_.reshape(-1, 128), toks4, ranges, nb)
t = measure(lambda s: (m_off.at[0].set(s % 2), m_d, m_len, val),
            lambda a, b, c, v: kern_part(a, b, c, v), iters=4)
print(f"asm: toks build + expand kernel: {t*1e3:.1f} ms", flush=True)
