"""Fresh encoder stage breakdown on the reworked pipeline (level 6, 1 MB).

Cumulative prefixes of encode_batch_impl: each stage's cost = diff of
consecutive rows. Mirrors the body; update if the pipeline changes.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2400, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.ops import lz77, bitpack, huffman
from jdeflate_tpu.formats import constants as C

n = 1 << 20
bl, batch, level = 1 << 16, 16, 6
base = B.make_corpus(n)
HALO, PAD = De.HALO, De.PAD
sets = []
for shift in (0, 1):
    d = bytearray(base)
    if shift:
        for p in range(100, len(d), 8192):
            d[p] ^= 1
    buf = np.zeros(HALO + batch * bl + PAD, np.uint8)
    buf[HALO:HALO + batch * bl] = np.frombuffer(bytes(d), np.uint8)[:batch * bl]
    sets.append((jnp.asarray(buf),))

cfg = levels_mod.get_level(level)
nw = De.words_bound(bl, batch)
nch = De._nch(bl, cfg.chunk)
CH = bl // nch
NL, ND = C.NUM_LITLEN_USED, C.NUM_DIST_USED
Bb = batch

def front(data):
    starts = jnp.arange(batch, dtype=jnp.int32) * bl
    block_len = jnp.full(batch, bl, jnp.int32)
    valid_from = jnp.maximum(HALO - starts, 0)
    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s,), (HALO + bl + PAD,))
    )(starts)
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy, cfg.good_length)
    is_tok, t_take = lz77.token_marks_batch(length, take, block_len, bl)
    return ext, block_len, length, dist, is_tok, t_take

def syms(data):
    ext, block_len, length, dist, is_tok, t_take = front(data)
    t_len = jnp.where(t_take, length, 0)
    t_dist = jnp.where(t_take, dist, 0)
    t_lit = ext[:, HALO:HALO + bl].astype(jnp.int32)
    n_ = jnp.maximum(t_len - 3, 0)
    l2n = lz77._floor_log2(jnp.maximum(n_, 1))
    lsym_m = jnp.where(n_ < 8, 257 + n_,
                       265 + ((l2n - 3) << 2) + ((n_ >> jnp.maximum(l2n - 2, 0)) & 3))
    lsym_m = jnp.where(t_len == 258, 285, lsym_m)
    m_ = jnp.maximum(t_dist - 1, 0)
    l2m = lz77._floor_log2(jnp.maximum(m_, 1))
    dsym = jnp.where(m_ < 4, m_,
                     (l2m << 1) + ((m_ >> jnp.maximum(l2m - 1, 0)) & 1))
    lsym = jnp.where(t_take, lsym_m, t_lit)
    return lsym, dsym, is_tok, t_take

def s_freq(data):
    lsym, dsym, is_tok, t_take = syms(data)
    NHI = 18
    ls_c = lsym.reshape(Bb * nch, CH)
    hi5 = (ls_c >> 4).astype(jnp.int32)
    lo4 = (ls_c & 15).astype(jnp.int32)
    A_hi = (hi5[:, :, None] == jnp.arange(NHI)[None, None, :]).astype(jnp.bfloat16)
    B_lo = (lo4[:, :, None] == jnp.arange(16)[None, None, :]).astype(jnp.bfloat16)
    v_tok = is_tok.reshape(Bb * nch, CH).astype(jnp.bfloat16)
    lf2 = jnp.einsum("cpg,cpj->cgj", A_hi, B_lo * v_tok[:, :, None],
                     preferred_element_type=jnp.float32)
    ds_c = dsym.reshape(Bb * nch, CH)
    D_oh = (ds_c[:, :, None] == jnp.arange(ND)[None, None, :]).astype(jnp.bfloat16)
    mt = (t_take & is_tok).reshape(Bb * nch, CH).astype(jnp.bfloat16)
    df = jnp.einsum("cps,cp->cs", D_oh, mt, preferred_element_type=jnp.float32)
    return lf2.astype(jnp.int32), df.astype(jnp.int32)

def s_full(data):
    return De.encode_batch_impl(data, jnp.int32(0), jnp.int32(batch * bl),
                                jnp.int32(0), jnp.int32(-1), bl, batch,
                                level, nw)

rows = [("front(match+parse)", front), ("syms", syms),
        ("freq(matmul)", s_freq), ("full", s_full)]
for name, fn in rows:
    t = measure_cycled(sets, fn, iters=3)
    print(f"E2 {name}: {t*1e3:.1f} ms/MB", flush=True)

# isolated pieces on realistic shapes: pack at halved N, anchor-scan scatter
N2 = (1 + De.HDR_ITEMS + CH // 2) * Bb * nch + 1
rng = np.random.default_rng(0)
psets = []
for s in range(2):
    nb = np.where(rng.random(N2) < 0.35, rng.integers(5, 30, N2), 0)
    lo = rng.integers(0, 1 << 16, N2).astype(np.uint32)
    psets.append((jnp.asarray(lo), jnp.asarray(lo),
                  jnp.asarray(nb, np.int32)))
def p_pack(lo, hi, nb):
    return bitpack.pack(lo, hi, nb, nw)
t = measure_cycled(psets, p_pack, iters=4)
print(f"E2 pack(N={N2}): {t*1e3:.1f} ms", flush=True)

NI = (1 + De.HDR_ITEMS + CH) * Bb * nch + 1
A_BLK = De.anchors_cap(bl, cfg.chunk)
asets = []
for s in range(2):
    aidx = rng.integers(0, A_BLK, (Bb, NI)).astype(np.int32)
    offs = rng.integers(0, 1 << 22, (Bb, NI)).astype(np.int32)
    asets.append((jnp.asarray(aidx), jnp.asarray(offs)))
def p_anch(aidx, offs):
    BIGA = np.int32(1 << 30)
    tgt = jnp.arange(Bb, dtype=jnp.int32)[:, None] * A_BLK + aidx
    return jnp.full(Bb * A_BLK + 1, BIGA, jnp.int32).at[
        tgt.reshape(-1)].min(offs.reshape(-1), mode="drop")[:Bb * A_BLK]
t = measure_cycled(asets, p_anch, iters=4)
print(f"E2 anchor scatter-min (N={Bb*NI}): {t*1e3:.1f} ms", flush=True)
print("done", flush=True)
