"""Device crc32 after the bit-linear rewrite (was 72 ms / 0.116 GB/s)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import zlib
import jax.numpy as jnp
from devtime import measure_cycled
from jdeflate_tpu.ops import checksum as cs

n = 8 << 20
rng = np.random.default_rng(1)
a = rng.integers(0, 256, n, dtype=np.uint8)
b = a.copy(); b[::8192] ^= 1
for x in (a, b):
    got = cs.crc32(x.tobytes())
    want = zlib.crc32(x.tobytes())
    assert got == want, (got, want)
print("crc32 correct vs zlib", flush=True)
sets = [(jnp.asarray(a),), (jnp.asarray(b),)]
t = measure_cycled(sets, lambda d: cs._crc32_device(
    d, jnp.uint32(0), jnp.uint32(n)), iters=4)
print(f"crc32 device: {t*1e3:.2f} ms  ({n/t/1e9:.2f} GB/s)", flush=True)
t = measure_cycled(sets, lambda d: cs._adler32_device(
    d, jnp.uint32(1), jnp.uint32(n)), iters=4)
print(f"adler32 device: {t*1e3:.2f} ms  ({n/t/1e9:.2f} GB/s)", flush=True)
