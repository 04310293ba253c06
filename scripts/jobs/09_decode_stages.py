import sys, time
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith('jdeflate_tpu'):
        del sys.modules[m]
import jax, jax.numpy as jnp, numpy as np
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import decode as dk
from jdeflate_tpu.stream import native

rng = np.random.default_rng(0)
words_ = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
n = 4 << 20
data = b"".join(words_[int(rng.integers(5))] for _ in range(n // 4))[:n]
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
raw, idx = enc.compress(data)
print("compressed", len(raw))

t0 = time.perf_counter()
recs = [native.parse_block_header(raw, b) for b in idx["block_bits"]]
print(f"host header parse {len(recs)} blocks: {(time.perf_counter()-t0)*1e3:.0f} ms")

# count fallbacks by instrumenting decode_batch calls
orig = I.decode_batch
calls = {"seg": 0, "dense": 0}
def spy(*a, **k):
    calls["dense" if k.get("dense") else "seg"] += 1
    return orig(*a, **k)
I.decode_batch = spy
dec = I.RawInflater()
out = dec.decompress(raw, index=idx)
print("warm ok", out == data, calls)
calls["seg"] = calls["dense"] = 0
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
print(f"decode steady: {(time.perf_counter()-t0)*1e3:.0f} ms calls={calls}")
I.decode_batch = orig

# raw decode_batch timing on the single batch shapes (from a fresh driver run,
# log shapes)
