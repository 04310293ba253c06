"""Round-4: expand3 (MXU batch engine) on real TPU — full bench-corpus
round-trip through the windowed decode path + device timing vs expand2."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.codec import inflate as I

data = make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                  max_batch_out=1 << 23)
t0 = time.time()
raw, idx = enc.compress(data)
print(f"compress {time.time()-t0:.1f}s {len(raw)} bytes", flush=True)

calls = []
orig = I.decode_batch_windows
I.decode_batch_windows = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
try:
    t0 = time.time()
    out = dec.decompress(raw, index=idx)
    print(f"decompress(v4) {time.time()-t0:.1f}s roundtrip={out == data}",
          flush=True)
finally:
    I.decode_batch_windows = orig

# device timing: cycle two perturbed variants through the same program
d2 = bytearray(data)
for p in range(100, len(d2), 8192):
    d2[p] ^= 1
variants = [data, bytes(d2)]
sets = []
statics = None
for v in variants:
    cc = []
    I.decode_batch_windows = lambda *a, **k: (cc.append(a), orig(*a, **k))[1]
    try:
        r2, i2 = enc.compress(v)
        o2 = dec.decompress(r2, index=i2)
        assert o2 == v
    finally:
        I.decode_batch_windows = orig
    a = cc[0]
    sets.append(a[:8])
    statics = tuple(a[8:12])
npe, ne, oc, up = statics
print(f"npe={npe} oc={oc}", flush=True)


def dstage(w, p0, pt, al, l_, d_, wn, h):
    return I.decode_batch_windows(w, p0, pt, al, l_, d_, wn, h,
                                  npe, ne, oc, up)


t = measure_cycled(sets, dstage, iters=4)
print(f"decode_batch_windows(v4): {t*1e3:.2f} ms per batch "
      f"({oc / t / 1e9:.3f} GB/s)", flush=True)
print("done")
