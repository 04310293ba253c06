"""Split exact_ext cost: top-T suffix-run passes vs compacted gather rounds."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1500, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec import deflate as De
from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.ops import lz77

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

def mk(data, ext_top, ext_rounds, exact):
    starts = jnp.arange(batch, dtype=jnp.int32) * bl
    block_len = jnp.full(batch, bl, jnp.int32)
    valid_from = jnp.maximum(HALO - starts, 0)
    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s,), (HALO + bl + PAD,))
    )(starts)
    return lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=ext_top, ext_rounds=ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, exact_ext=exact)

for name, et, er, ex in (("full(top8,r4)", 8, 4, True),
                         ("top0,r4", 0, 4, True),
                         ("top8,r0", 8, 0, True),
                         ("top2,r2", 2, 2, True),
                         ("noext", 8, 4, False)):
    def st(data, _et=et, _er=er, _ex=ex):
        return mk(data, _et, _er, _ex)
    t = measure_cycled(sets, st, iters=3)
    print(f"MATCHES {name}: {t*1e3:.1f} ms/MB", flush=True)
print("done", flush=True)
