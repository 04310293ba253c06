"""Second-round microbenchmarks: gather patterns as they appear in the codec
(inside fori_loop, index arithmetic, u8 vs u32 operands, interleaved)."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    N = 1 << 20
    M = (1 << 20) + (1 << 19)
    x = jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    # 1. plain gather redux
    t = timeit(jax.jit(lambda x, i: x[i]), x, idx)
    print(f"plain gather: {t*1e3:.2f} ms", flush=True)

    # 2. 10 dependent-ish gathers in a python loop (like one probe)
    def ten(x, i):
        acc = jnp.zeros_like(i, dtype=jnp.uint32)
        for k in range(10):
            acc = acc ^ x[i + k]
        return acc
    t = timeit(jax.jit(ten), x, idx)
    print(f"10 gathers unrolled: {t*1e3:.2f} ms", flush=True)

    # 3. same inside fori_loop (like the probe loop)
    def ten_fori(x, i):
        def body(k, acc):
            return acc ^ x[i + k]
        return jax.lax.fori_loop(0, 10, body, jnp.zeros_like(i, dtype=jnp.uint32))
    t = timeit(jax.jit(ten_fori), x, idx)
    print(f"10 gathers fori: {t*1e3:.2f} ms", flush=True)

    # 4. 48-iter fori with ~10 gathers each (probe-loop shape)
    def probes(x, i):
        def body(k, carry):
            bl_, bc_ = carry
            j = i - k
            a = x[jnp.maximum(j, 0)]
            b = x[jnp.maximum(j, 0) + 4]
            c = x[i + 8] ^ x[jnp.maximum(j, 0) + 8]
            l = (a & 15).astype(jnp.int32) + (b & 15).astype(jnp.int32) \
                + (c & 15).astype(jnp.int32)
            better = l > bl_
            return jnp.where(better, l, bl_), jnp.where(better, j, bc_)
        return jax.lax.fori_loop(
            0, 48, body,
            (jnp.zeros_like(i), jnp.zeros_like(i)))
    t = timeit(jax.jit(probes), x, idx)
    print(f"48-iter probe-ish fori (5 gathers/iter): {t*1e3:.2f} ms", flush=True)

    # 5. gather from u8 operand
    xb = jnp.asarray(rng.integers(0, 255, M, dtype=np.uint8))
    t = timeit(jax.jit(lambda x, i: x[i]), xb, idx)
    print(f"u8 gather: {t*1e3:.2f} ms", flush=True)

    # 6. gather with computed index (adds, mods)
    t = timeit(jax.jit(lambda x, i: x[(i * 3 + 7) % N]), x, idx)
    print(f"computed-idx gather: {t*1e3:.2f} ms", flush=True)

    # 7. 2D argsort along axis 1 (batched sort)
    k2 = jnp.asarray(rng.integers(0, 1 << 30, (16, 98304), dtype=np.uint32))
    t = timeit(jax.jit(lambda a: jnp.argsort(a, axis=1)), k2)
    print(f"argsort (16, 98304) axis=1: {t*1e3:.2f} ms", flush=True)

    # 8. scatter inside: rank build
    order = jnp.argsort(k2, axis=1)
    def rank_build(order):
        B, nh = order.shape
        sbase = (jnp.arange(B, dtype=jnp.int32) * nh)[:, None]
        of = (sbase + order).reshape(-1)
        return jnp.zeros(B * nh, jnp.int32).at[of].set(
            jnp.tile(jnp.arange(nh, dtype=jnp.int32), B))
    t = timeit(jax.jit(rank_build), order)
    print(f"rank scatter (16*98304): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
