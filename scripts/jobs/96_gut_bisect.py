"""Gut the real kernel piecewise (env flags), time each config."""
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
sets = []
for s in range(2):
    tok = np.zeros((L, 32), np.uint32)
    outlen = np.zeros(L, np.int32)
    tok[:, 0] = (1 << 30) | rng.integers(0, 256, L)
    tok[:, 1] = (2 << 30) | 20 | ((rng.integers(1, 30000, L) - 1) << 9)
    outlen[:] = 21
    sets.append((jnp.asarray(tok), jnp.asarray(outlen),
                 jnp.zeros(ex3.HALO, jnp.uint8)))


def stage(tok_lm, outlen, halo):
    return ex3.expand_tokens(tok_lm, outlen, halo, OC)


cfgs = [
    ("full", {}),
    ("nobatch", {"EX3_NOBATCH": "1"}),
    ("nosub", {"EX3_NOSUB": "1"}),
    ("nojump", {"EX3_NOJUMP": "1"}),
    ("onemerge", {"EX3_ONEMERGE": "1"}),
    ("nophase12", {"EX3_NOPHASE12": "1"}),
    ("onemerge+nophase12", {"EX3_ONEMERGE": "1", "EX3_NOPHASE12": "1"}),
]
for name, env in cfgs:
    for k in ("EX3_NOBATCH", "EX3_NOSUB", "EX3_NOJUMP", "EX3_ONEMERGE",
              "EX3_NOPHASE12"):
        os.environ.pop(k, None)
    os.environ.update(env)
    ex3._expand_tokens_impl.clear_cache()
    try:
        t = measure_cycled(sets, stage, iters=4)
        print(f"{name}: {t * 1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
print("done")
