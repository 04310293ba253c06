import time
import jax
import jax.numpy as jnp
import numpy as np

def timeit(fn, *args, reps=3):
    t0 = time.perf_counter()
    int(jnp.sum(fn(*args)))
    print(f"  (first call {time.perf_counter()-t0:.1f}s)", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    B, nh = 16, 98304
    key = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w0 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))
    w1 = jnp.asarray(rng.integers(0, 1 << 31, (B, nh), dtype=np.uint32))

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
    print(f"48 shifted probes (slice): {t*1e3:.2f} ms", flush=True)

    def msort(key, w0, w1):
        return jax.lax.sort((key, w0, w1), dimension=1, num_keys=1)[1]
    t = timeit(jax.jit(msort), key, w0, w1)
    print(f"3-operand sort (16,98K): {t*1e3:.2f} ms", flush=True)

    N = 1 << 20
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    x = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
    t = timeit(jax.jit(lambda i, v: jnp.zeros(N, jnp.int32).at[i].add(v)), idx, x)
    print(f"scatter-add 1M: {t*1e3:.2f} ms", flush=True)

    tab = jnp.asarray(rng.integers(0, 255, 256, dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
    t = timeit(jax.jit(lambda t_, b_: t_[b_]), tab, b)
    print(f"LUT-256 gather 1M: {t*1e3:.2f} ms", flush=True)

    t = timeit(jax.jit(lambda t_, b_: jnp.take(t_, b_)), tab, b)
    print(f"LUT-256 take 1M: {t*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
