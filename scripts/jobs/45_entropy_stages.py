"""Break down the encoder's entropy stage (~64 ms/MB unaccounted in 41):
split_dp, vmapped _block_entropy, code_lengths alone, canonical alone,
code-lookup + append_bits table stage.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1800, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.ops import lz77, huffman
from jdeflate_tpu.formats import constants as C

n = 1 << 20
bl, batch, level = 1 << 16, 16, 6
base = B.make_corpus(n)
HALO, PAD = De.HALO, De.PAD
cfg = levels_mod.get_level(level)
nch = De._nch(bl, cfg.chunk)
CH = bl // nch
NL, ND = C.NUM_LITLEN_USED, C.NUM_DIST_USED
Bb = batch
print(f"nch={nch} CH={CH} groups={batch*nch}", flush=True)

# ---- produce real per-group freqs on device once, pull to host ----
def freqs_of(data):
    starts = jnp.arange(batch, dtype=jnp.int32) * bl
    block_len = jnp.full(batch, bl, jnp.int32)
    valid_from = jnp.maximum(HALO - starts, 0)
    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s,), (HALO + bl + PAD,))
    )(starts)
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy, cfg.good_length)
    is_tok, t_take = lz77.token_marks_batch(length, take, block_len, bl)
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
    vi = is_tok.astype(jnp.int32)
    pos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    cidx = jnp.arange(Bb, dtype=jnp.int32)[:, None] * nch + pos // CH
    lfreq_c = jnp.zeros(Bb * nch * NL, jnp.int32).at[
        (cidx * NL + jnp.where(is_tok, lsym, 0)).reshape(-1)].add(
        vi.reshape(-1)).reshape(Bb, nch, NL)
    mt = (t_take & is_tok).astype(jnp.int32)
    dfreq_c = jnp.zeros(Bb * nch * ND, jnp.int32).at[
        (cidx * ND + jnp.where(t_take, dsym, 0)).reshape(-1)].add(
        mt.reshape(-1)).reshape(Bb, nch, ND)
    return lfreq_c, dfreq_c

sets_freq = []
for shift in (0, 1):
    d = bytearray(base)
    if shift:
        for p in range(100, len(d), 8192):
            d[p] ^= 1
    buf = np.zeros(HALO + batch * bl + PAD, np.uint8)
    buf[HALO:HALO + batch * bl] = np.frombuffer(bytes(d), np.uint8)[:batch * bl]
    lf, df = jax.jit(freqs_of)(jnp.asarray(buf))
    lf = np.asarray(lf); df = np.asarray(df)
    # group freqs ~ chunk freqs for timing purposes (use chunk-level direct)
    live = (lf.sum(-1) > 0)
    sets_freq.append((jnp.asarray(lf), jnp.asarray(df),
                      jnp.asarray(live)))

# ---- stage timings ----
def t_split(lf, df, live):
    zl = jnp.zeros((Bb, 1, NL), jnp.int32)
    zd = jnp.zeros((Bb, 1, ND), jnp.int32)
    Pl = jnp.concatenate([zl, jnp.cumsum(lf, axis=1)], axis=1)
    Pd = jnp.concatenate([zd, jnp.cumsum(df, axis=1)], axis=1)
    return jax.vmap(lambda a, b: De._split_dp(
        a, b, nch, cfg.split_c0, cfg.split_c1))(Pl, Pd)

def t_entropy(lf, df, live):
    return jax.vmap(
        lambda a, b, lv: De._block_entropy(a, b, lv, cfg, False)
    )(lf.reshape(-1, NL), df.reshape(-1, ND), live.reshape(-1))

def t_cl_l(lf, df, live):
    return jax.vmap(lambda f: huffman.code_lengths(f, C.MAX_CODE_BITS))(
        lf.reshape(-1, NL))

def t_cl_d(lf, df, live):
    return jax.vmap(lambda f: huffman.code_lengths(f, C.MAX_CODE_BITS))(
        df.reshape(-1, ND))

def t_canon(lf, df, live):
    dl = jax.vmap(lambda f: huffman.code_lengths(f, C.MAX_CODE_BITS))(
        lf.reshape(-1, NL))
    return jax.vmap(lambda l: huffman.canonical_codes(l, C.MAX_CODE_BITS))(dl)

for name, fn in (("split_dp", t_split), ("entropy(all)", t_entropy),
                 ("code_lengths(L)", t_cl_l), ("code_lengths(D)", t_cl_d),
                 ("cl+canonical(L)", t_canon)):
    t = measure_cycled(sets_freq, fn, iters=3)
    print(f"ENT {name}: {t*1e3:.2f} ms/MB", flush=True)
print("done", flush=True)
