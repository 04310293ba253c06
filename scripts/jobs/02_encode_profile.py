import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jdeflate_tpu.codec import deflate as D

rng = np.random.default_rng(0)
words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
bl, batch = 1 << 16, 16
n = bl * batch
data = b"".join(words[int(rng.integers(5))] for _ in range(n // 4))[:n]
buf = np.zeros(D.HALO + n + D.PAD, np.uint8)
buf[D.HALO:D.HALO + n] = np.frombuffer(data, np.uint8)
dev = jnp.asarray(buf)
nw = D.words_bound(bl, batch)

f = jax.jit(lambda d: D.encode_batch_impl(
    d, jnp.int32(0), jnp.int32(n), jnp.int32(0), jnp.int32(batch - 1),
    bl, batch, 6, nw)[1])
t0 = time.perf_counter(); tot = int(f(dev))
print(f"compile+run {time.perf_counter()-t0:.1f}s, bits={tot}")
for _ in range(3):
    t0 = time.perf_counter(); int(f(dev))
    print(f"steady encode 1MB: {(time.perf_counter()-t0)*1e3:.0f} ms")

# stage: matcher only
from jdeflate_tpu.ops import lz77
from jdeflate_tpu.codec import levels as L
cfg = L.get_level(6)
starts = jnp.arange(batch, dtype=jnp.int32) * bl
def matches(d):
    ext = jax.vmap(lambda s: jax.lax.dynamic_slice(d, (s,), (D.HALO+bl+D.PAD,)))(starts)
    bls = jnp.full((batch,), bl, jnp.int32)
    vf = jnp.where(starts == 0, D.HALO, 0)
    ln, dist = lz77.find_matches_batch(ext, bls, vf, D.HALO, bl, D.PAD, cfg.probes, 0)
    return ln
fm = jax.jit(matches)
int(jnp.sum(fm(dev)))
t0 = time.perf_counter(); int(jnp.sum(fm(dev)))
print(f"matcher only: {(time.perf_counter()-t0)*1e3:.0f} ms")

# stage: matcher + parse + orbit
def orbit_stage(d):
    ext = jax.vmap(lambda s: jax.lax.dynamic_slice(d, (s,), (D.HALO+bl+D.PAD,)))(starts)
    bls = jnp.full((batch,), bl, jnp.int32)
    vf = jnp.where(starts == 0, D.HALO, 0)
    ln, dist = lz77.find_matches_batch(ext, bls, vf, D.HALO, bl, D.PAD, cfg.probes, 0)
    nxt, take = lz77.parse_batch(ln, dist, bls, bl, cfg.lazy, cfg.good_length)
    return lz77.orbit_batch(nxt, batch, bl)
fo = jax.jit(orbit_stage)
int(jnp.sum(fo(dev)))
t0 = time.perf_counter(); int(jnp.sum(fo(dev)))
print(f"matcher+parse+orbit: {(time.perf_counter()-t0)*1e3:.0f} ms")
