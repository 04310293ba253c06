import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def log(*a):
    print(*a, flush=True)

from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I

# mixed corpus like bench (text + records + runs + random)
rng = np.random.default_rng(20260817)
parts = []
words = [b"the ", b"of ", b"and ", b"compression ", b"deflate ",
         b"window ", b"entropy ", b"stream ", b"block ", b"huffman "]
n = 1 << 20
total = 0
while total < n:
    kind = rng.integers(4)
    if kind == 0:
        k = int(rng.integers(1 << 14, 1 << 16))
        idx = rng.integers(0, len(words), k // 6)
        seg = b"".join(words[i] for i in idx)[:k]
    elif kind == 1:
        rec = rng.integers(0, 256, 96, dtype=np.uint8)
        reps = int(rng.integers(100, 800))
        m = np.tile(rec, (reps, 1))
        seg = m.tobytes()
    elif kind == 2:
        k = int(rng.integers(1 << 13, 1 << 15))
        vals = rng.integers(0, 8, k // 64, dtype=np.uint8)
        seg = np.repeat(vals, 64).tobytes()
    else:
        k = int(rng.integers(1 << 12, 1 << 14))
        seg = rng.integers(0, 256, k, dtype=np.uint8).tobytes()
    parts.append(seg)
    total += len(seg)
data = b"".join(parts)[:n]

t0 = time.perf_counter()
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
raw, idx = enc.compress(data)
log("compress warm", round(time.perf_counter() - t0, 2), "->", len(raw))
t0 = time.perf_counter()
raw, idx = enc.compress(data)
log("compress steady", round(time.perf_counter() - t0, 3))

# spy on anchored decode to report err/produced BEFORE fallback kicks in
orig = I.decode_batch_anchored
stats = []
def spy(*a, **k):
    o, produced, err, nwin = orig(*a, **k)
    stats.append((int(produced), int(err)))
    return o, produced, err, nwin
I.decode_batch_anchored = spy

dec = I.RawInflater(max_batch_bits=1 << 24, max_batch_blocks=64,
                    max_batch_out=1 << 22)
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
log("decode warm", round(time.perf_counter() - t0, 2), "ok", out == data)
log("anchored stats (produced, err):", stats)
I.decode_batch_anchored = orig
stats.clear()
t0 = time.perf_counter()
out = dec.decompress(raw, index=idx)
log("decode steady", round(time.perf_counter() - t0, 3), "ok", out == data)
