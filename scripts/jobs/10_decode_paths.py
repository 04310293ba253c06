import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I

rng = np.random.default_rng(0)
words_ = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
n = 4 << 20
data = b"".join(words_[int(rng.integers(5))] for _ in range(n // 4))[:n]
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
t0 = time.perf_counter()
raw, idx = enc.compress(data)
print("compress warm", time.perf_counter() - t0, len(raw))
t0 = time.perf_counter()
raw, idx = enc.compress(data)
print("compress steady", time.perf_counter() - t0)

calls = {"seg": 0, "dense": 0, "anchored": 0}
orig_db = I.decode_batch
orig_da = I.decode_batch_anchored
def spy_db(*a, **k):
    calls["dense" if (k.get("dense") or (len(a) > 12 and a[12])) else "seg"] += 1
    return orig_db(*a, **k)
def spy_da(*a, **k):
    calls["anchored"] += 1
    return orig_da(*a, **k)
I.decode_batch = spy_db
I.decode_batch_anchored = spy_da

dec = I.RawInflater(max_batch_bits=1 << 24, max_batch_blocks=64,
                    max_batch_out=1 << 22)
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
print("decode warm", time.perf_counter() - t0, "ok", out == data, calls)
for k in calls: calls[k] = 0
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
print("decode steady", time.perf_counter() - t0, "ok", out == data, calls)
