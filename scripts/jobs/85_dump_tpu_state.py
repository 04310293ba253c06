import os

os.environ["EX3_DEBUG_DUMP"] = "1"
os.environ["EX3_DEBUG_TRACK"] = "268,105"
import jax

import sys
sys.path.insert(0, "/root/repo")
import numpy as np
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
    s = 0; col = 0
    for _ in range(n):
        if col >= 30: break
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
NL = 40
halo = jnp.asarray(rng.integers(0, 256, ex3.HALO).astype(np.uint8))
out, produced, kerr, dbg = ex3.expand_tokens_dbg(
    jnp.asarray(tok[:NL]), jnp.asarray(outlen[:NL]), halo, 8192,
    interpret=False)
d = np.asarray(dbg)
np.save("/tmp/dump_tpu.npy", d)
print("bytehist:", d[33][:12].tolist())
for r in range(35, 41):
    print("round", r - 35, "state[0:40]:", d[r][:40].tolist())
