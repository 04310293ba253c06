"""Microbenchmarks of the primitive ops our pipelines lean on, on the real
backend. Establishes which primitives are fast on this TPU so the codec
kernels can be designed around them."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
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

    x = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    f = jax.jit(lambda x, i: x[i])
    t = timeit(f, x, idx)
    print(f"gather 1M<-1M i32: {t*1e3:.2f} ms  ({N/t/1e9:.2f} G elem/s)", flush=True)

    x2 = x.reshape(-1, 128)
    idx2 = jnp.asarray(rng.integers(0, x2.shape[0], 8192, dtype=np.int32))
    f2 = jax.jit(lambda x, i: x[i])
    t = timeit(f2, x2, idx2)
    print(f"row-gather 8K rows of 128: {t*1e3:.2f} ms ({8192*128/t/1e9:.2f} G elem/s)", flush=True)

    f3 = jax.jit(lambda x: jnp.sort(x))
    t = timeit(f3, x)
    print(f"sort 1M u32: {t*1e3:.2f} ms", flush=True)

    f4 = jax.jit(lambda x: jnp.argsort(x))
    t = timeit(f4, x)
    print(f"argsort 1M: {t*1e3:.2f} ms", flush=True)

    f5 = jax.jit(lambda x: jnp.cumsum(x))
    t = timeit(f5, x)
    print(f"cumsum 1M: {t*1e3:.2f} ms", flush=True)

    y = jnp.zeros(N, jnp.int32)
    f6 = jax.jit(lambda y, i, v: y.at[i].add(v))
    t = timeit(f6, y, idx, x)
    print(f"scatter-add 1M: {t*1e3:.2f} ms", flush=True)

    tab = jnp.asarray(rng.integers(0, 255, 256, dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
    f7 = jax.jit(lambda t_, b_: t_[b_])
    t = timeit(f7, tab, b)
    print(f"small-LUT gather 1M<-256: {t*1e3:.2f} ms", flush=True)

    tab2 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 15, dtype=np.int32))
    f8 = jax.jit(lambda t_, b_: t_[b_])
    idx15 = jnp.asarray(rng.integers(0, 1 << 15, N, dtype=np.int32))
    t = timeit(f8, tab2, idx15)
    print(f"32K-LUT gather 1M<-32K: {t*1e3:.2f} ms", flush=True)

    # take_along_axis 2D: (B, L) gather per-row
    B, L = 64, 1 << 14
    xb = jnp.asarray(rng.integers(0, 1 << 30, (B, L), dtype=np.int32))
    ib = jnp.asarray(rng.integers(0, L, (B, L), dtype=np.int32))
    f9 = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
    t = timeit(f9, xb, ib)
    print(f"take_along_axis (64,16K): {t*1e3:.2f} ms ({B*L/t/1e9:.2f} G elem/s)", flush=True)

    # dispatch latency
    f10 = jax.jit(lambda a: a + 1)
    s = jnp.float32(0)
    t = timeit(f10, s, reps=20)
    print(f"dispatch latency: {t*1e6:.0f} us", flush=True)

    # elementwise bandwidth
    big = jnp.asarray(rng.integers(0, 255, 1 << 26, dtype=np.uint8))
    f11 = jax.jit(lambda a: (a.astype(jnp.int32) * 3 + 1).sum())
    t = timeit(f11, big)
    print(f"elementwise 64MB u8: {t*1e3:.2f} ms ({(1<<26)/t/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
