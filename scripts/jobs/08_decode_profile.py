import sys, time
sys.path.insert(0, "/root/repo")
import importlib
for m in list(sys.modules):
    if m.startswith('jdeflate_tpu'):
        del sys.modules[m]
import jax, jax.numpy as jnp, numpy as np
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater

rng = np.random.default_rng(0)
words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
n = 4 << 20
data = b"".join(words[int(rng.integers(5))] for _ in range(n // 4))[:n]
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
t0 = time.perf_counter()
raw, idx = enc.compress(data)
print(f"encode 4MB (incl compile): {time.perf_counter()-t0:.1f}s -> {len(raw)} bytes")
t0 = time.perf_counter()
raw, idx = enc.compress(data)
print(f"encode 4MB steady: {(time.perf_counter()-t0)*1e3:.0f} ms ({n/(time.perf_counter()-t0)/1e6:.0f} MB/s)")

dec = RawInflater()
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
print(f"decode (incl compile): {time.perf_counter()-t0:.1f}s ok={out==data}")
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
dt = time.perf_counter()-t0
print(f"decode steady: {dt*1e3:.0f} ms ({n/dt/1e6:.0f} MB/s out, {len(raw)/dt/1e6:.0f} MB/s in) ok={out==data}")
