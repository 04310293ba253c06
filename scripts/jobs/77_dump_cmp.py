"""Compare kernel-internal batch-0 state: TPU vs interpret."""
import os
os.environ["EX3_DEBUG_DUMP"] = "1"
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
NL = 40
tok2 = jnp.asarray(tok[:NL])
outlen2 = jnp.asarray(outlen[:NL])
halo = jnp.asarray(rng.integers(0, 256, ex3.HALO).astype(np.uint8))
capb = 8192

dumps = {}
for mode in (True, False):
    out, produced, kerr, dbg = ex3.expand_tokens_dbg(
        tok2, outlen2, halo, capb, interpret=mode)
    _ = np.asarray(out)
    dumps[mode] = np.asarray(dbg)
    print("mode interp=%s produced=%d kerr=%d" % (mode, int(produced),
                                                  int(kerr)), flush=True)
names = ["dst", "w", "src0", "srcJ", "per", "spc0", "spcJ", "sw", "nit",
         "bstart"]
a, b = dumps[True], dumps[False]
for r, nm in enumerate(names):
    d = np.nonzero(a[r] != b[r])[0]
    if len(d):
        print(f"row {nm}: {len(d)} diffs at {d[:8]}", flush=True)
        for j in d[:6]:
            print(f"   item {j}: interp={a[r, j]} tpu={b[r, j]}", flush=True)
    else:
        print(f"row {nm}: identical", flush=True)
print("done", flush=True)
