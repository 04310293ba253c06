"""Microbenchmarks with forced host materialization (block_until_ready may
not block under the axon remote platform)."""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    int(jnp.sum(fn(*args)))   # warm + force
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = int(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    N = 1 << 20
    M = (1 << 20) + (1 << 19)
    x = jnp.asarray(rng.integers(0, 1 << 20, M, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    t = timeit(jax.jit(lambda x, i: x[i]), x, idx)
    print(f"plain gather 1M: {t*1e3:.2f} ms ({N/t/1e9:.2f} G/s)", flush=True)

    def probes(x, i):
        def body(k, carry):
            bl_, bc_ = carry
            j = i - k
            a = x[jnp.maximum(j, 0)]
            b = x[jnp.maximum(j, 0) + 4]
            c = x[i + 8] ^ x[jnp.maximum(j, 0) + 8]
            l = (a & 15) + (b & 15) + (c & 15)
            better = l > bl_
            return jnp.where(better, l, bl_), jnp.where(better, j, bc_)
        r = jax.lax.fori_loop(0, 48, body,
                              (jnp.zeros_like(i), jnp.zeros_like(i)))
        return r[0]
    t = timeit(jax.jit(probes), x, idx)
    print(f"48-iter probe fori (5 gathers): {t*1e3:.2f} ms "
          f"({48*5*N/t/1e9:.2f} G elem/s)", flush=True)

    k2 = jnp.asarray(rng.integers(0, 1 << 30, (16, 98304), dtype=np.uint32))
    t = timeit(jax.jit(lambda a: jnp.argsort(a, axis=1).astype(jnp.int32)), k2)
    print(f"argsort (16,98K): {t*1e3:.2f} ms", flush=True)

    big = jnp.asarray(rng.integers(0, 255, 1 << 26, dtype=np.uint8))
    t = timeit(jax.jit(lambda a: (a.astype(jnp.int32) * 3 + 1)), big)
    print(f"elementwise 64MB: {t*1e3:.2f} ms ({(1<<26)/t/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
