"""Stage-level timing of the encode pipeline on the real backend, plus a
TPU-vs-CPU decode equivalence probe."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from jdeflate_tpu.codec import deflate as D
from jdeflate_tpu.codec import levels as L
from jdeflate_tpu.ops import lz77, huffman, bitpack


def bench(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
    bl, batch = 1 << 16, 16
    n = bl * batch
    data = b"".join(words[int(rng.integers(5))] for _ in range(n // 5))[:n]
    buf = np.zeros(D.HALO + n + D.PAD, np.uint8)
    buf[D.HALO:D.HALO + n] = np.frombuffer(data, np.uint8)
    dev = jnp.asarray(buf)
    cfg = L.get_level(6)
    nw = D.words_bound(bl, batch)

    # full pipeline
    f_all = jax.jit(lambda d: D.encode_batch_impl(
        d, jnp.int32(0), jnp.int32(n), jnp.int32(0), jnp.int32(batch - 1),
        bl, batch, 6, nw))
    print("compiling full...", flush=True)
    t0 = time.perf_counter()
    bench("encode_batch full", f_all, dev)
    print(f"(incl first compile {time.perf_counter()-t0:.1f}s)", flush=True)

    # stage: ext slice + matches
    starts = jnp.arange(batch, dtype=jnp.int32) * bl

    def stage_matches(d):
        ext = jax.vmap(lambda s: jax.lax.dynamic_slice(
            d, (s,), (D.HALO + bl + D.PAD,)))(starts)
        bls = jnp.full((batch,), bl, jnp.int32)
        vf = jnp.where(starts == 0, D.HALO, 0)
        ln, dist = lz77.find_matches_batch(ext, bls, vf, D.HALO, bl, D.PAD,
                                           cfg.probes, cfg.rerank)
        return ln, dist

    lnd = bench("matches (sort+probes+extend)", jax.jit(stage_matches), dev)

    def stage_parse(d):
        ln, dist = stage_matches(d)
        bls = jnp.full((batch,), bl, jnp.int32)
        nxt, take = lz77.parse_batch(ln, dist, bls, bl, cfg.lazy,
                                     cfg.good_length)
        p = lz77.orbit_batch(nxt, batch, bl)
        return p

    bench("  + parse + orbit", jax.jit(stage_parse), dev)

    # huffman alone
    freqs = jnp.asarray(rng.integers(0, 1000, (batch, 286), dtype=np.int32))
    bench("huffman build x16", jax.jit(
        lambda f: huffman.build_codes(f, 15)), freqs)

    # pack alone
    ni = (D.HDR_ITEMS + bl + 1) * batch
    lo = jnp.asarray(rng.integers(0, 1 << 16, ni, dtype=np.uint32))
    hi = jnp.zeros(ni, jnp.uint32)
    nb = jnp.asarray(rng.integers(0, 16, ni, dtype=np.int32))
    bench("bitpack scatter", jax.jit(
        lambda a, b, c: bitpack.pack(a, b, c, nw)), lo, hi, nb)


if __name__ == "__main__":
    main()
