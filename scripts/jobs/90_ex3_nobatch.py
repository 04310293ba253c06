"""Time extraction-only (EX3_NOBATCH) at real scale."""
import os
os.environ["EX3_NOBATCH"] = "1"
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
sets = []
for s in range(2):
    tok = np.zeros((L, 32), np.uint32)
    outlen = np.zeros(L, np.int32)
    # ~2 tokens per lane like real data
    tok[:, 0] = (1 << 30) | rng.integers(0, 256, L)
    tok[:, 1] = (2 << 30) | 20 | ((rng.integers(1, 30000, L) - 1) << 9)
    outlen[:] = 21
    sets.append((jnp.asarray(tok), jnp.asarray(outlen),
                 jnp.zeros(ex3.HALO, jnp.uint8)))

def stage(tok_lm, outlen, halo):
    return ex3.expand_tokens(tok_lm, outlen, halo, OC)

t = measure_cycled(sets, stage, iters=4)
print(f"extraction-only: {t*1e3:.2f} ms per batch-scale call", flush=True)
print("done", flush=True)
