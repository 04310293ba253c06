"""Scale test on TPU: same shapes as the real bench batch (L=131072,
cap=2MB), synthetic tokens, numpy referee."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jdeflate_tpu.ops import expand3 as ex3

rng = np.random.default_rng(5)
TOK_LIT = 1 << 30
TOK_MATCH = 2 << 30
L = 131072
tok = np.zeros((L, 32), np.uint32)
outlen = np.zeros(L, np.int32)
total = 0
CAP = 1 << 21
for i in range(L):
    if total >= CAP - 600:
        break
    n = int(rng.integers(1, 6))
    s = 0
    col = 0
    for _ in range(n):
        if col >= 30:
            break
        if total + s < 8 or rng.random() < 0.5:
            k = int(rng.integers(1, 5))
            for _ in range(k):
                if col >= 30: break
                tok[i, col] = TOK_LIT | int(rng.integers(0, 256))
                col += 1; s += 1
        else:
            d = int(rng.integers(1, min(total + s, 32768) + 1))
            ln = int(rng.integers(3, 259))
            tok[i, col] = TOK_MATCH | ln | ((d - 1) << 9)
            col += 1; s += ln
    outlen[i] = s
    total += s
print("total", total, flush=True)

halo = rng.integers(0, 256, ex3.HALO).astype(np.uint8)

out_ref = bytearray()
for i in range(L):
    for t in tok[i]:
        t = int(t)
        k = (t >> 30) & 3
        if k == 0: break
        if k == 1: out_ref.append(t & 0xFF)
        else:
            ln = t & 0x1FF
            d = ((t >> 9) & 0x7FFF) + 1
            for _ in range(ln):
                p = len(out_ref) - d
                out_ref.append(out_ref[p] if p >= 0 else halo[p])
ref = bytes(out_ref)
print("ref built", len(ref), flush=True)

out, produced, kerr = ex3.expand_tokens(
    jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo), CAP)
got = bytes(np.asarray(out)[:int(produced)])
print("produced", int(produced), "expect", len(ref), "kerr", int(kerr),
      flush=True)
diffs = [i for i in range(min(len(got), len(ref))) if got[i] != ref[i]]
print("ndiffs", len(diffs), diffs[:10], flush=True)
if diffs:
    i = diffs[0]
    print("got ", got[max(0,i-4):i+12].hex(), flush=True)
    print("want", ref[max(0,i-4):i+12].hex(), flush=True)
print("done", flush=True)
