"""Sub-stage timing inside find_matches on the real backend."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from jdeflate_tpu.codec import deflate as D
from jdeflate_tpu.ops import lz77 as M

HALO, PAD = D.HALO, D.PAD


def bench(name, fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
    bl, B = 1 << 16, 16
    n = bl * B
    data = b"".join(words[int(rng.integers(5))] for _ in range(n // 4))[:n]
    ext = np.zeros((B, HALO + bl + PAD), np.uint8)
    for b in range(B):
        s = b * bl
        ext[b, HALO:HALO + bl] = np.frombuffer(data[s:s + bl], np.uint8)
        if s:
            h = min(HALO, s)
            ext[b, HALO - h:HALO] = np.frombuffer(data[s - h:s], np.uint8)
    ext = jnp.asarray(ext)
    nh = HALO + bl

    def hash_sort(e):
        w = M._words_le(e)
        pos = jnp.arange(nh, dtype=jnp.int32)
        h = ((w[:nh] * M.HASH_MULT) >> (32 - M.HASH_BITS)).astype(jnp.uint32)
        key = (h << 17) | pos.astype(jnp.uint32)
        order = jnp.argsort(key)
        rank = jnp.zeros(nh, jnp.int32).at[order].set(pos)
        return w, order.astype(jnp.int32), h[order], rank

    bench("hash+sort+rank x16", jax.jit(jax.vmap(hash_sort)), ext)

    w, sorted_pos, sorted_hash, rank = jax.jit(jax.vmap(hash_sort))(ext)

    def probes_k(w, sorted_pos, sorted_hash, rank, k):
        qi = HALO + jnp.arange(bl, dtype=jnp.int32)
        qrank = rank[qi]
        qhash = sorted_hash[jnp.clip(qrank, 0, nh - 1)]  # placeholder touch
        best_len = jnp.zeros(bl, jnp.int32)
        best_cand = jnp.zeros(bl, jnp.int32)
        for kk in range(1, k + 1):
            j = qrank - kk
            jc = jnp.maximum(j, 0)
            cand = sorted_pos[jc]
            ok = (j >= 0) & (cand >= 0)
            l16 = jnp.where(ok, M._cmp16(w, qi, cand), 0)
            better = l16 > best_len
            best_len = jnp.where(better, l16, best_len)
            best_cand = jnp.where(better, cand, best_cand)
        return best_len, best_cand

    for k in (4, 16, 48):
        f = jax.jit(jax.vmap(lambda w_, sp, sh, r: probes_k(w_, sp, sh, r, k)))
        bench(f"probes k={k} x16", f, w, sorted_pos, sorted_hash, rank)

    def ext_only(w, cand):
        qi = HALO + jnp.arange(bl, dtype=jnp.int32)
        return M._extend(w, qi, cand, jnp.full(bl, 16, jnp.int32))

    cand0 = jnp.zeros((B, bl), jnp.int32)
    bench("extension x16", jax.jit(jax.vmap(ext_only)), w, cand0)

    # single big gather shapes comparable to one probe step
    idx = jnp.asarray(rng.integers(0, nh, (B, bl), dtype=np.int32))
    bench("one batched gather (16,64K)<-(16,98K)",
          jax.jit(jax.vmap(lambda a, i: a[i])), w, idx)
    bench("cmp16 given cand x16",
          jax.jit(jax.vmap(lambda w_, c: M._cmp16(
              w_, HALO + jnp.arange(bl, dtype=jnp.int32), c))), w, idx)


if __name__ == "__main__":
    main()
