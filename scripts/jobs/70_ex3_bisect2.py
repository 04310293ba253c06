"""Bisect the Mosaic gather lowering failure in expand3."""
import importlib
import os
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import jdeflate_tpu.ops.expand3 as ex3

tok = np.zeros((512, 32), np.uint32)
tok[0, 0] = (1 << 30) | 65
outlen = np.zeros(512, np.int32)
outlen[0] = 1
halo = jnp.zeros(ex3.HALO, jnp.uint8)

for nobatch in ("1", ""):
    os.environ["EX3_NOBATCH"] = nobatch
    importlib.reload(ex3)
    try:
        out, produced, kerr = ex3.expand_tokens(
            jnp.asarray(tok), jnp.asarray(outlen), halo, 4096)
        print(f"NOBATCH={nobatch!r}: OK out0={np.asarray(out[:2])} "
              f"produced={int(produced)}", flush=True)
    except Exception as e:
        tb = traceback.format_exc()
        lines = [l for l in tb.splitlines() if "expand3.py" in l]
        print(f"NOBATCH={nobatch!r}: FAIL {type(e).__name__}", flush=True)
        for l in lines[:12]:
            print("   ", l.strip(), flush=True)
print("done")
