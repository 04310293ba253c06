"""Corrected (forced-materialization) measurements of scatter, small-LUT
gather, multi-operand sort, take-along-axis."""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    int(jnp.sum(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    N = 1 << 20
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    x = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))

    t = timeit(jax.jit(lambda i, v: jnp.zeros(N, jnp.int32).at[i].add(v)), idx, x)
    print(f"scatter-add 1M: {t*1e3:.2f} ms", flush=True)

    t = timeit(jax.jit(lambda i, v: jnp.zeros(N, jnp.int32).at[i].set(v)), idx, x)
    print(f"scatter-set 1M: {t*1e3:.2f} ms", flush=True)

    tab = jnp.asarray(rng.integers(0, 255, 256, dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
    t = timeit(jax.jit(lambda t_, b_: t_[b_]), tab, b)
    print(f"LUT-256 gather 1M: {t*1e3:.2f} ms", flush=True)

    # one-hot matmul LUT
    def lut_mm(t_, b_):
        oh = jax.nn.one_hot(b_, 256, dtype=jnp.bfloat16)
        return (oh @ t_.astype(jnp.bfloat16)).astype(jnp.int32)
    t = timeit(jax.jit(lut_mm), tab, b)
    print(f"LUT-256 one-hot matmul 1M: {t*1e3:.2f} ms", flush=True)

    tab15 = jnp.asarray(rng.integers(0, 1 << 20, 1 << 15, dtype=np.int32))
    i15 = jnp.asarray(rng.integers(0, 1 << 15, N, dtype=np.int32))
    t = timeit(jax.jit(lambda t_, b_: t_[b_]), tab15, i15)
    print(f"LUT-32K gather 1M: {t*1e3:.2f} ms", flush=True)

    # multi-operand segmented sort (the planned match-finder core)
    B, nh = 16, 98304
    key = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w0 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w1 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w2 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w3 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))

    def msort(key, w0, w1, w2, w3):
        out = jax.lax.sort((key, w0, w1, w2, w3), dimension=1, num_keys=1)
        return out[1]
    t = timeit(jax.jit(msort), key, w0, w1, w2, w3)
    print(f"5-operand sort (16,98K): {t*1e3:.2f} ms", flush=True)

    def ssort(key):
        return jax.lax.sort((key,), dimension=1, num_keys=1)[0]
    t = timeit(jax.jit(ssort), key)
    print(f"1-operand sort (16,98K): {t*1e3:.2f} ms", flush=True)

    # shifted elementwise probe loop (the zero-gather chain walk)
    def shift_probes(key, w0, w1):
        def body(k, best):
            kk = jnp.roll(key, k, axis=1)
            e0 = jnp.roll(w0, k, axis=1) == w0
            e1 = jnp.roll(w1, k, axis=1) == w1
            l = e0.astype(jnp.int32) * 4 + (e0 & e1).astype(jnp.int32) * 4
            return jnp.maximum(best, jnp.where(kk >> 17 == key >> 17, l, 0))
        return jax.lax.fori_loop(1, 49, body, jnp.zeros_like(key, jnp.int32))
    t = timeit(jax.jit(shift_probes), key, w0, w1)
    print(f"48 shifted probes (roll) (16,98K): {t*1e3:.2f} ms", flush=True)

    # slicing instead of roll
    def slice_probes(key, w0, w1):
        best = jnp.zeros((B, nh), jnp.int32)
        for k in range(1, 49):
            kk = jnp.pad(key[:, :-k], ((0, 0), (k, 0)))
            e0 = jnp.pad(w0[:, :-k], ((0, 0), (k, 0))) == w0
            e1 = jnp.pad(w1[:, :-k], ((0, 0), (k, 0))) == w1
            l = e0.astype(jnp.int32) * 4 + (e0 & e1).astype(jnp.int32) * 4
            best = jnp.maximum(best, jnp.where(kk >> 17 == key >> 17, l, 0))
        return best
    t = timeit(jax.jit(slice_probes), key, w0, w1)
    print(f"48 shifted probes (pad-slice unrolled): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
