"""Encoder device-time breakdown via cumulative prefix pipelines.

Times encode_batch_impl stage prefixes on real inputs (distinct-input
cycling). The difference between consecutive prefixes is the stage cost.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2000, exit=True)
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
nch = De._nch(bl)
CH = bl // nch
NL, ND = C.NUM_LITLEN_USED, C.NUM_DIST_USED
Bb = batch

def common_front(data):
    starts = jnp.arange(batch, dtype=jnp.int32) * bl
    block_len = jnp.full(batch, bl, jnp.int32)
    valid_from = jnp.maximum(HALO - starts, 0)
    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s,), (HALO + bl + PAD,))
    )(starts)
    return ext, block_len, valid_from

def s1_matches(data):
    ext, block_len, valid_from = common_front(data)
    return lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words)

def s1b_matches_noext(data):
    ext, block_len, valid_from = common_front(data)
    return lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, exact_ext=False)

def s2_parse(data):
    ext, block_len, valid_from = common_front(data)
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy, cfg.good_length)
    is_tok, t_take = lz77.token_marks_batch(length, take, block_len, bl)
    return is_tok, t_take

def s_full(data):
    return De.encode_batch_impl(data, jnp.int32(0), jnp.int32(batch * bl),
                                jnp.int32(0), jnp.int32(-1), bl, batch,
                                level, nw)

for name, fn in (("full", s_full), ("matches", s1_matches),
                 ("matches_noext", s1b_matches_noext), ("parse", s2_parse)):
    t = measure_cycled(sets, fn, iters=4)
    print(f"ENC {name}: {t*1e3:.1f} ms per {batch*bl>>20} MB", flush=True)

# isolated back-end stages with captured intermediates
length, dist = jax.jit(s1_matches)(sets[0][0])
length2, dist2 = jax.jit(s1_matches)(sets[1][0])

# freq-count scatter probe: flat scatter-add of B*bl symbols
def freq_scatter(lsym, vi):
    pos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    cidx = jnp.arange(Bb, dtype=jnp.int32)[:, None] * nch + pos // CH
    return jnp.zeros(Bb * nch * NL, jnp.int32).at[
        (cidx * NL + lsym).reshape(-1)].add(vi.reshape(-1))
ls = [(jnp.asarray(np.random.randint(0, NL, (Bb, bl)), jnp.int32),
       jnp.asarray(np.random.randint(0, 2, (Bb, bl)), jnp.int32)),
      (jnp.asarray(np.random.randint(0, NL, (Bb, bl)), jnp.int32),
       jnp.asarray(np.random.randint(0, 2, (Bb, bl)), jnp.int32))]
t = measure_cycled(ls, freq_scatter, iters=4)
print(f"ENC freq scatter-add ({Bb*bl/1e6:.1f}M): {t*1e3:.1f} ms", flush=True)

# bitpack scatter probe at production size
nitems = Bb * (nch * (1 + De.HDR_ITEMS + CH) + 1)
rngnp = np.random.default_rng(0)
def mkpack(seed):
    nb = rngnp.integers(0, 12, nitems).astype(np.int32)
    lo = rngnp.integers(0, 1 << 12, nitems).astype(np.uint32)
    return (jnp.asarray(lo), jnp.asarray(np.zeros(nitems, np.uint32)),
            jnp.asarray(nb))
ps = [mkpack(0), mkpack(1)]
def packfn(lo, hi, nb):
    return bitpack.pack(lo, hi, nb, nw)
t = measure_cycled(ps, packfn, iters=4)
print(f"ENC bitpack.pack ({nitems/1e6:.2f}M items): {t*1e3:.1f} ms",
      flush=True)

# emission-table gathers (lpack/dpack indexed by 1M syms)
def emit_gather(lsym, vi):
    lpack = jnp.asarray(np.random.randint(0, 1 << 20, (Bb * nch * NL,)),
                        jnp.uint32)
    pos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    cidx = jnp.arange(Bb, dtype=jnp.int32)[:, None] * nch + pos // CH
    return lpack[(cidx * NL + lsym).reshape(-1)]
t = measure_cycled(ls, emit_gather, iters=4)
print(f"ENC emission gather (1M): {t*1e3:.1f} ms", flush=True)
print("done", flush=True)
