"""Tune exact_ext params: size vs oracle AND encode device ms across
(ext_top, ext_rounds, ext_mdiv) variants at levels 6 and 9.
"""
import sys, dataclasses, subprocess, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(3000, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.ops import lz77

n = 2 << 20
base = B.make_corpus(n)
oracle = B.build_oracle()
osz = {lv: len(B.oracle_size(oracle, base, lv)) for lv in (6, 9)}
print("oracle sizes", osz, flush=True)

HALO, PAD = De.HALO, De.PAD
bl, batch = 1 << 16, 16

get_level0 = levels_mod.get_level

def run(level, top, rounds, mdiv):
    cfg0 = get_level0(level)
    cfg = dataclasses.replace(cfg0, ext_top=top, ext_rounds=rounds,
                              ext_mdiv=mdiv)
    levels_mod.get_level = lambda lv: cfg if lv == level else get_level0(lv)
    # encode_batch_packed is jit-cached on the static `level` arg only; the
    # cfg is read at trace time, so clear traces between variants
    jax.clear_caches()
    try:
        enc = De.RawDeflater(level=level, block_size=bl, batch=batch)
        raw, idx = enc.compress(base)
        size = len(raw)
        # device time for the match stage only (full encode timing is long)
        sets = []
        for shift in (0, 1):
            d = bytearray(base[:1 << 20])
            if shift:
                for p in range(100, len(d), 8192):
                    d[p] ^= 1
            buf = np.zeros(HALO + 16 * bl + PAD, np.uint8)
            buf[HALO:HALO + 16 * bl] = np.frombuffer(
                bytes(d), np.uint8)[:16 * bl]
            sets.append((jnp.asarray(buf),))
        def st(data):
            starts = jnp.arange(16, dtype=jnp.int32) * bl
            block_len = jnp.full(16, bl, jnp.int32)
            valid_from = jnp.maximum(HALO - starts, 0)
            ext = jax.vmap(lambda s: jax.lax.dynamic_slice(
                data, (s,), (HALO + bl + PAD,)))(starts)
            return lz77.find_matches_batch(
                ext, block_len, valid_from, HALO, bl, PAD,
                max(cfg.probes, 1), ext_top=cfg.ext_top,
                ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
                probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)
        t = measure_cycled(sets, st, iters=3)
        print(f"L{level} top{top} r{rounds} m{mdiv}: size {size} "
              f"({size/osz[level]:.5f}x oracle)  matches {t*1e3:.1f} ms/MB",
              flush=True)
    finally:
        levels_mod.get_level = get_level0

for (lv, top, rounds, mdiv) in (
        (6, 8, 4, 16),    # current
        (6, 8, 2, 16),
        (6, 8, 2, 64),
        (6, 8, 1, 64),
        (6, 4, 2, 64),
        (6, 8, 0, 16),
        (9, 16, 16, 16),  # current
        (9, 16, 8, 16),
        (9, 16, 16, 64),
        (9, 16, 8, 32)):
    run(lv, top, rounds, mdiv)
print("done", flush=True)
