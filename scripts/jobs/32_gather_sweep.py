"""Trustworthy sweep: dependent-gather step cost vs table size and lane count.

Uses truetime.measure (fori_loop + salt + scalar readback). Each measured
stage runs a 64-iteration dependent gather chain, mimicking the decode walk's
structure. Reports per-step cost.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1500, exit=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure

STEPS = 64

def chain(tab, idx0, steps=STEPS, ngather=1):
    T = tab.shape[0]
    def body(i, p):
        for g in range(ngather):
            p = (tab[p & (T - 1)] + p + 1) & (T - 1)
        return p
    return jax.lax.fori_loop(0, steps, body, idx0)

for Tlog in (10, 13, 15, 17, 21, 23):
    T = 1 << Tlog
    tabn = np.random.randint(0, T, T).astype(np.int32)
    tab = jnp.asarray(tabn)
    for Llog in (12, 14, 16, 18):
        L = 1 << Llog
        idxn = np.random.randint(0, T, L).astype(np.int32)
        idx = jnp.asarray(idxn)
        def mk(salt):
            return (tab, (idx + salt.astype(jnp.int32)) & (T - 1))
        def st(tab_, idx_):
            return chain(tab_, idx_)
        t = measure(mk, st, iters=4)
        per = t / STEPS
        print(f"T=2^{Tlog} L=2^{Llog}: {per*1e6:8.1f} us/step "
              f"({L/per/1e9:6.2f} G elem/s)", flush=True)

# vector-op-only loop (no gathers): fixed per-iteration cost of a walk-like
# body (~30 elementwise ops on (L,) arrays)
for Llog in (12, 16):
    L = 1 << Llog
    idx = jnp.asarray(np.random.randint(0, 1 << 15, L).astype(np.int32))
    def mk(salt):
        return (idx + salt.astype(jnp.int32),)
    def st(p):
        def body(i, p):
            for _ in range(10):
                p = ((p * 5) ^ (p >> 3)) + 1
            return p
        return jax.lax.fori_loop(0, STEPS, body, p)
    t = measure(mk, st, iters=4)
    print(f"vecops30 L=2^{Llog}: {t/STEPS*1e6:8.1f} us/step", flush=True)
print("done", flush=True)
