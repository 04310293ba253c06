"""Gut bisect of v4.3 on synthetic real-scale tokens."""
import os
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from devtime import measure_cycled
from jdeflate_tpu.ops import expand3 as ex3

rng = np.random.default_rng(5)
L = 131072
OC = 1 << 21
tok = np.zeros((L, 32), np.uint32)
outlen = np.zeros(L, np.int32)
total = 0
for i in range(L):
    if total >= OC - 600:
        break
    n = int(rng.integers(1, 6))
    s = 0; col = 0
    for _ in range(n):
        if col >= 30: break
        if total + s < 8 or rng.random() < 0.5:
            k = int(rng.integers(1, 5))
            for _ in range(k):
                if col >= 30: break
                tok[i, col] = (1 << 30) | int(rng.integers(0, 256))
                col += 1; s += 1
        else:
            d = int(rng.integers(1, min(total + s, 32768) + 1))
            ln = int(rng.integers(3, 259))
            tok[i, col] = (2 << 30) | ln | ((d - 1) << 9)
            col += 1; s += ln
    outlen[i] = s
    total += s
sets = [(jnp.asarray(tok), jnp.asarray(outlen),
         jnp.zeros(ex3.HALO, jnp.uint8)),
        (jnp.asarray(tok), jnp.asarray(outlen),
         jnp.ones(ex3.HALO, jnp.uint8))]


def stage(tok_lm, ol, h):
    return ex3.expand_tokens(tok_lm, ol, h, OC)


for name, env in [("full", {}), ("nophase", {"EX3_NOPHASE": "1"}),
                  ("nojump", {"EX3_NOJUMP": "1"}),
                  ("nobatch", {"EX3_NOBATCH": "1"}),
                  ("nophase+nojump", {"EX3_NOPHASE": "1",
                                      "EX3_NOJUMP": "1"})]:
    for k in ("EX3_NOBATCH", "EX3_NOPHASE", "EX3_NOJUMP"):
        os.environ.pop(k, None)
    os.environ.update(env)
    ex3._expand_tokens_impl.clear_cache()
    t = measure_cycled(sets, stage, iters=4)
    print(f"{name}: {t * 1e3:.2f} ms", flush=True)
print("done")
