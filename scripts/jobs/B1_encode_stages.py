"""Per-stage encode device budget (VERDICT r4 #3): matchfind / parse / walk /
freqs / full, on the real bench segment at level 6."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.formats import constants as C
from jdeflate_tpu.ops import lz77

data = make_corpus(8 << 20)
enc = De.RawDeflater(level=6, block_size=1 << 16, batch=16)
enc.capture_calls = True
sets = []
for pert in (0, 1):
    d2 = bytearray(data)
    if pert:
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
    raw, idx = enc.compress(bytes(d2))
    sets.append(enc.last_calls[0])
(bl, batch, level, nw, fixed) = enc.call_statics
cfg = levels_mod.get_level(level)
HALO, PAD = De.HALO, De.PAD
print("statics:", enc.call_statics, "probes", cfg.probes,
      "pw", cfg.probe_words, flush=True)


def prologue(dev, sb, tl, dl, fb):
    bidx = sb + jnp.arange(batch, dtype=jnp.int32)
    starts = bidx * bl
    block_len = jnp.clip(tl - starts, 0, bl)
    avail = jnp.minimum(starts + dl, HALO)
    valid_from = HALO - avail
    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(dev, (s,), (HALO + bl + PAD,))
    )(starts)
    return ext, block_len, valid_from


def s_match(dev, sb, tl, dl, fb):
    ext, block_len, valid_from = prologue(dev, sb, tl, dl, fb)
    return lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)


def s_parse(dev, sb, tl, dl, fb):
    ext, block_len, valid_from = prologue(dev, sb, tl, dl, fb)
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy,
                           cfg.good_length)
    return take


def s_walk(dev, sb, tl, dl, fb):
    ext, block_len, valid_from = prologue(dev, sb, tl, dl, fb)
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy,
                           cfg.good_length)
    return lz77.token_marks_batch(length, take, block_len, bl)


def s_full(dev, sb, tl, dl, fb):
    return De.encode_batch_packed(dev, sb, tl, dl, fb, bl, batch, level,
                                  nw, fixed)


MB = bl * batch / 1e9
for name, fn in [("matchfind", s_match), ("match+parse", s_parse),
                 ("match+parse+walk", s_walk), ("full_encode", s_full)]:
    t = measure_cycled(sets, jax.jit(fn), iters=3)
    print(f"{name}: {t*1e3:.2f} ms  ({MB/t:.4f} GB/s)", flush=True)
