"""Encode per-stage device budget via the new stage taps (cumulative ms)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import functools
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec import deflate as De

data = make_corpus(8 << 20)
enc = De.RawDeflater(level=6, block_size=1 << 16, batch=16)
enc.capture_calls = True
sets = []
for pert in (0, 1):
    d2 = bytearray(data)
    if pert:
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
    raw, idx = enc.compress(bytes(d2))
    sets.append(enc.last_calls[0])
(bl, batch, level, nw, fixed) = enc.call_statics
MBps = bl * batch / 1e9
print("statics:", enc.call_statics, flush=True)

prev = 0.0
for st in ["items", "stored", "pack", "offsets", ""]:
    fn = jax.jit(functools.partial(
        De.encode_batch_impl, bl=bl, batch=batch, level=level,
        num_words=nw, fixed_codes=fixed, stage=st))
    t = measure_cycled(sets, fn, iters=3)
    name = st or "full"
    print(f"{name:>8}: {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f})  "
          f"{MBps/t:.4f} GB/s", flush=True)
    prev = t
