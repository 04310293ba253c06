"""Probe encoder fix candidates: sorted-scatter bitpack, block-entropy cost,
anchors cost."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1500, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.formats import constants as C

bl, batch = 1 << 16, 16
nch = De._nch(bl)
CH = bl // nch
nw = De.words_bound(bl, batch)
nitems = batch * (nch * (1 + De.HDR_ITEMS + CH) + 1)
rngnp = np.random.default_rng(0)

def mkpack(seed):
    r = np.random.default_rng(seed)
    nb = r.integers(0, 12, nitems).astype(np.int32)
    lo = r.integers(0, 1 << 12, nitems).astype(np.uint32)
    return (jnp.asarray(lo), jnp.asarray(np.zeros(nitems, np.uint32)),
            jnp.asarray(nb))
ps = [mkpack(0), mkpack(1)]

def pack_sorted(lo, hi, nbits):
    offs = jnp.cumsum(nbits) - nbits
    word = (offs >> 5).astype(jnp.int32)
    s = (offs & 31).astype(jnp.uint32)
    rs = jnp.minimum(32 - s, 31)
    w0 = lo << s
    w1 = jnp.where(s == 0, 0, lo >> rs) | (hi << s)
    w2 = jnp.where(s == 0, 0, hi >> rs)
    live = nbits > 0
    w0 = jnp.where(live, w0, 0)
    w1 = jnp.where(live, w1, 0)
    w2 = jnp.where(live, w2, 0)
    out = jnp.zeros(nw, jnp.uint32)
    out = out.at[word].add(w0, indices_are_sorted=True)
    out = out.at[jnp.minimum(word + 1, nw - 1)].add(
        w1, indices_are_sorted=True)
    out = out.at[jnp.minimum(word + 2, nw - 1)].add(
        w2, indices_are_sorted=True)
    return out

t = measure_cycled(ps, pack_sorted, iters=4)
print(f"pack sorted-hint: {t*1e3:.1f} ms", flush=True)

def pack_cumsum(lo, hi, nbits):
    """Segmented-sum formulation: cumsum + one boundary scatter-max."""
    offs = jnp.cumsum(nbits) - nbits
    word = (offs >> 5).astype(jnp.int32)
    s = (offs & 31).astype(jnp.uint32)
    rs = jnp.minimum(32 - s, 31)
    live = nbits > 0
    w0 = jnp.where(live, lo << s, 0)
    w1 = jnp.where(live, jnp.where(s == 0, 0, lo >> rs) | (hi << s), 0)
    w2 = jnp.where(live, jnp.where(s == 0, 0, hi >> rs), 0)
    c0 = jnp.cumsum(w0)
    c1 = jnp.cumsum(w1)
    c2 = jnp.cumsum(w2)
    # last item index per word (scatter-max + cummax fill)
    idx = jnp.arange(nitems, dtype=jnp.int32)
    bnd = jnp.full(nw, -1, jnp.int32).at[word].max(
        idx, mode="drop", indices_are_sorted=True)
    bnd = jax.lax.cummax(bnd)
    has = bnd >= 0
    bndc = jnp.maximum(bnd, 0)
    g0 = c0[bndc]
    g1 = c1[bndc]
    g2 = c2[bndc]
    z0 = jnp.concatenate([jnp.zeros(1, jnp.uint32), g0[:-1]])
    z1 = jnp.concatenate([jnp.zeros(2, jnp.uint32), g1[:-2]])
    z1b = jnp.concatenate([jnp.zeros(1, jnp.uint32), g1[:-1]])
    z2 = jnp.concatenate([jnp.zeros(2, jnp.uint32), g2[:-2]])
    z2b = jnp.concatenate([jnp.zeros(3, jnp.uint32), g2[:-3]])
    out = jnp.where(has, g0 - z0, 0) + (z1b - z1) + (z2 - z2b)
    return out

t = measure_cycled(ps, pack_cumsum, iters=4)
print(f"pack cumsum-seg: {t*1e3:.1f} ms", flush=True)

# equivalence check vs reference pack
from jdeflate_tpu.ops import bitpack
a = np.asarray(jax.jit(lambda l, h, n: bitpack.pack(l, h, n, nw)[0])(*ps[0]))
b = np.asarray(jax.jit(pack_cumsum)(*ps[0]))
print("cumsum-seg equivalent:", bool((a == b).all()), flush=True)
c = np.asarray(jax.jit(pack_sorted)(*ps[0]))
print("sorted-hint equivalent:", bool((a == c).all()), flush=True)

# block entropy stage (vmapped 128 groups)
cfg = levels_mod.get_level(6)
NL, ND = C.NUM_LITLEN_USED, C.NUM_DIST_USED
def mkfreq(seed):
    r = np.random.default_rng(seed)
    lf = r.integers(0, 1000, (batch * nch, NL)).astype(np.int32)
    df = r.integers(0, 300, (batch * nch, ND)).astype(np.int32)
    lv = np.ones(batch * nch, bool)
    return jnp.asarray(lf), jnp.asarray(df), jnp.asarray(lv)
fs = [mkfreq(0), mkfreq(1)]
def entropy(lf, df, lv):
    return jax.vmap(lambda a, b, c: De._block_entropy(a, b, c, cfg))(
        lf, df, lv)
t = measure_cycled(fs, entropy, iters=4)
print(f"block entropy x{batch*nch}: {t*1e3:.1f} ms", flush=True)
print("done", flush=True)
