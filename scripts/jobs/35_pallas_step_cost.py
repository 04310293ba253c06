"""Resolve per-step in-kernel costs with large step counts (4096)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(1500, exit=True)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from truetime import measure

R = 64
STEPS = 4096

def probe(name, kernel, nsub=1, R_=None):
    Rr = R_ or R
    def build(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Rr, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    tab = jnp.asarray(np.random.randint(0, 128, (Rr, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (Rr, 128)), jnp.int32)
    def mk(salt):
        return (tab, (idx + salt.astype(jnp.int32)) & 127)
    try:
        t = measure(mk, build, iters=4)
        per = t / (STEPS * nsub)
        lanes = Rr * 128
        print(f"{name}: {t*1e3:7.2f} ms/call, {per*1e9:7.1f} ns/substep, "
              f"{lanes/per/1e9:7.1f} G lane-ops/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:150]}", flush=True)

# 1: single lane-gather per step
def k1(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, p):
        return (p + jnp.take_along_axis(tab, p & 127, axis=1) + 1) & 1048575
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("G1 lane-gather x1", k1)

# 2: 8 dependent gathers per step
def k2(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, p):
        for _ in range(8):
            p = (p + jnp.take_along_axis(tab, p & 127, axis=1) + 1)
        return p & 1048575
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("G8 lane-gather x8", k2, nsub=8)

# 3: 30 vector ops
def k3(tab_ref, idx_ref, out_ref):
    def body(i, p):
        for _ in range(30):
            p = ((p * 5) ^ (p >> 3)) + 1
        return p
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("V30 vecops", k3, nsub=30)

# 4: 16-way row select (refill simulation): value = sum_i (w==i)?row_i
def k4(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, p):
        w = p & 15
        acc = jnp.zeros_like(p)
        for j in range(16):
            acc = jnp.where(w == j, tab[j % R, :][None, :] + p, acc)
        return acc + 1
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("S16 16-way select", k4)

# 5: realistic decode phase: extract15 (varshifts) + rev15 + 15 threshold
# cmps + 2 lane-gathers + arith
def k5(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def body(i, st):
        p = st
        lo = p * 2654435761
        hi = p ^ 123456789
        s = p & 31
        c = ((lo >> s) | (hi << (32 - s))) & 32767
        # rev15
        x = c
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        c = x >> 1
        l = jnp.zeros_like(p)
        for j in range(15):
            lim = tab[j % R, :][None, :] * 131
            l = l + (c >= lim).astype(jnp.int32)
        off = (c >> (15 - jnp.clip(l, 1, 15)))
        sym = jnp.take_along_axis(tab, off & 127, axis=1)
        sym2 = jnp.take_along_axis(tab, (off + l) & 127, axis=1)
        sym3 = jnp.take_along_axis(tab, (off ^ sym) & 127, axis=1)
        return (st + sym + sym2 + sym3 + 1) & 1048575
    out_ref[:, :] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:, :])
probe("D1 decode-phase sim", k5)

# 6: while_loop with all-done reduction condition
def k6(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]
    def cond(c):
        i, p = c
        return i < STEPS
    def body(c):
        i, p = c
        p = (p + jnp.take_along_axis(tab, p & 127, axis=1) + 1) & 1048575
        return i + 1, p
    _, pf = jax.lax.while_loop(cond, body, (jnp.int32(0), idx_ref[:, :]))
    out_ref[:, :] = pf
probe("W1 while+gather", k6)

print("done", flush=True)
