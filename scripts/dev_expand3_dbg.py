import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import os
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import dev_expand3_kernel as ex3  # moved out of package (VERDICT r4 #4)

# monkeypatch debug into process_batch via env? simpler: replicate queue state
# by running the kernel with a probe output... use pl.debug_print by editing
# module source is overkill; instead run a micro-kernel exercising the same
# extraction path pieces outside pallas with jnp:

TOK_LIT = 1 << 30
tok = np.zeros((512, 32), np.uint32)
for i in range(10):
    tok[0, i] = TOK_LIT | (97 + i)
outlen = np.zeros(512, np.int32)
outlen[0] = 10

# run with debug prints enabled in the kernel
os.environ["EX3_DEBUG"] = "1"
out, produced, kerr = ex3.expand_tokens(
    jnp.asarray(tok), jnp.asarray(outlen),
    jnp.zeros(ex3.HALO, jnp.uint8), 4096, interpret=True)
print("out[:12]", np.asarray(out[:12]))
print("produced", int(produced), "kerr", int(kerr))
