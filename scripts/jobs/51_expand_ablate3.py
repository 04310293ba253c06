"""Ablate the CURRENT expand2 kernel (SMEM token chunks + register row).

Variants: A full; B token control only (SMEM loads + cursor arith, no
merges); C control + unconditional roll/select merge (no VMEM src reads,
no row-cross cond); D full minus the match-source VMEM row reads.
Per-2MB-batch times; A baseline ~15 ms.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2400, exit=True)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from devtime import measure_cycled
import bench as B
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import walk as wk
from jdeflate_tpu.ops import expand2 as ex2

n = 8 << 20
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=512,
                    max_batch_out=1 << 23)
base = B.make_corpus(n)
sets = []
for shift in (0, 1):
    if shift:
        d2 = bytearray(base)
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
        data = bytes(d2)
    else:
        data = base
    raw, idx = enc.compress(data)
    calls = []
    orig = I.decode_batch_windows
    I.decode_batch_windows = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    out = dec.decompress(raw, index=idx)
    I.decode_batch_windows = orig
    assert out == data
    a = calls[0]
    npe, ne, oc = a[8], a[9], a[10]
    w, p0, pt, al, l_, d_, wn, h = a[:8]
    t1, t2a, t2b, t2c = wk.build_entry_tables(l_, d_)
    def rows(tab):
        p = jnp.take(tab, pt, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)
    PE = wk.PE_LANES
    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(w, (s,), (PE + 8,)))(
        jnp.maximum(p0, 0))
    lanebit = (jnp.maximum(p0, 0)[:, None]
               + jnp.arange(PE, dtype=jnp.int32)[None, :]) * 32
    start_rel = jnp.where(al >= 0, al - lanebit, -1).astype(jnp.int32)
    tok, meta = wk.walk_tpu(seg[:, 0:PE].reshape(-1, 128),
                            seg[:, 1:PE + 1].reshape(-1, 128),
                            seg[:, 2:PE + 2].reshape(-1, 128),
                            start_rel.reshape(-1, 128),
                            rows(t1), rows(t2a), rows(t2b), rows(t2c),
                            npe * wk.PE_ROWS)
    tok_lm = wk.tok_to_lane_major(tok, npe * wk.PE_ROWS)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == wk.TOK_LIT, 1,
                     jnp.where(kind2 == wk.TOK_MATCH,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    tok_ann = wk.annotate_lit_runs(tok_lm)
    sets.append((jax.device_put(tok_ann), jax.device_put(outlen),
                 jax.device_put(wn)))
    print("variant", shift, "npe", npe, "oc", oc, flush=True)

L = sets[0][0].shape[0]


def run_variant(name, kernel_patch):
    saved = ex2._expand_kernel
    if kernel_patch is not None:
        ex2._expand_kernel = kernel_patch
    try:
        def st(tok_ann, outlen, wn):
            return ex2.expand_tokens(tok_ann, outlen, wn, oc)
        t = measure_cycled(sets, st, iters=8)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)
    finally:
        ex2._expand_kernel = saved



S = wk.S_SLOTS
HALO = ex2.HALO
RROWS = ex2.RROWS
TCH = ex2.TCH
TCHUNK_LANES = ex2.TCHUNK_LANES


def _frame(body):
    """Common prologue/epilogue around a per-region lane/token loop body."""
    def kern(lr_ref, regoff_ref, tok2d_hbm, buf_hbm, out_ref,
             vbuf, stage, tsm, tvm, sem_t, sem_v, sem_b):
        r = pl.program_id(0)
        l0 = lr_ref[r]
        l1 = lr_ref[r + 1]
        rs = regoff_ref[r]
        base_row = pl.multiple_of((((rs - HALO) >> 7) >> 5) << 5, 32)
        base = base_row << 7
        cp_b = pltpu.make_async_copy(
            out_ref.at[pl.ds(base_row, RROWS), :], stage, sem_b)
        cp_b.start(); cp_b.wait()
        vbuf[:, :] = stage[:, :].astype(jnp.int32)

        def fetch_chunk(l):
            cl0 = pl.multiple_of((l >> 5) << 5, 32)
            row0 = (cl0 * S) >> 7
            cp_t = pltpu.make_async_copy(
                tok2d_hbm.at[pl.ds(row0, TCH // 128), :], tsm, sem_t)
            cp_t.start()
            cp_v = pltpu.make_async_copy(
                tok2d_hbm.at[pl.ds(row0, TCH // 128 + 8), :], tvm, sem_v)
            cp_v.start()
            cp_t.wait(); cp_v.wait()
            return cl0

        body(l0, l1, rs, base, vbuf, tsm, tvm, fetch_chunk)

        stage[:, :] = vbuf[:, :].astype(jnp.uint8)
        cp_o = pltpu.make_async_copy(
            stage, out_ref.at[pl.ds(base_row, RROWS), :], sem_b)
        cp_o.start(); cp_o.wait()
    return kern


def bodyB(l0, l1, rs, base, vbuf, tsm, tvm, fetch_chunk):
    """Control only: SMEM token loads + cursor arithmetic."""
    def lane_body(carry):
        l, cl0, cursor = carry
        cl0 = jax.lax.cond(l - cl0 >= TCHUNK_LANES,
                           lambda: fetch_chunk(l), lambda: cl0)
        tokbase = (l - cl0) * S

        def tok_cond(c):
            s, cursor = c
            return s < S

        def tok_body(c):
            s, cursor = c
            ti0 = tokbase + s
            tok = tsm[ti0 >> 7, ti0 & 127]
            kind = (tok >> 30) & 3
            cnt = (tok >> 8) & 63
            ln = tok & 0x1FF
            adv = jnp.where(kind == wk.TOK_LIT, cnt, 1)
            oadv = jnp.where(kind == wk.TOK_LIT, cnt, ln)
            s2 = jnp.where(kind == 0, S, s + adv)
            return s2, cursor + jnp.where(kind == 0, 0, oadv)

        _, cursor = jax.lax.while_loop(tok_cond, tok_body,
                                       (jnp.int32(0), cursor))
        return l + 1, cl0, cursor

    def lane_cond(carry):
        l, cl0, cursor = carry
        return l < l1

    _, _, cursor = jax.lax.while_loop(
        lane_cond, lane_body, (l0, fetch_chunk(l0), rs))
    vbuf[pl.ds(0, 1), :] = jnp.full((1, 128), cursor, jnp.int32)


def bodyC(l0, l1, rs, base, vbuf, tsm, tvm, fetch_chunk):
    """Control + unconditional single-row merge per token (no VMEM src
    reads, no row-cross cond, no match inner loop)."""
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def lane_body(carry):
        l, cl0, cursor, curr = carry
        cl0 = jax.lax.cond(l - cl0 >= TCHUNK_LANES,
                           lambda: fetch_chunk(l), lambda: cl0)
        tokbase = (l - cl0) * S

        def tok_cond(c):
            s, cursor, curr = c
            return s < S

        def tok_body(c):
            s, cursor, curr = c
            ti0 = tokbase + s
            tok = tsm[ti0 >> 7, ti0 & 127]
            kind = (tok >> 30) & 3
            cnt = (tok >> 8) & 63
            ln = tok & 0x1FF
            adv = jnp.where(kind == wk.TOK_LIT, cnt, 1)
            w = jnp.where(kind == wk.TOK_LIT, cnt, jnp.minimum(ln, 128))
            doff = cursor & 127
            two = jnp.concatenate([curr, curr], 1)
            rolled = pltpu.roll(two, doff - (ti0 & 127), 1)[:, :128]
            sel = (lane1 >= doff) & (lane1 < doff + w)
            curr = jnp.where(sel, rolled, curr)
            s2 = jnp.where(kind == 0, S, s + adv)
            return s2, cursor + jnp.where(kind == 0, 0, w), curr

        _, cursor, curr = jax.lax.while_loop(
            tok_cond, tok_body, (jnp.int32(0), cursor, curr))
        return l + 1, cl0, cursor, curr

    def lane_cond(carry):
        l, cl0, cursor, curr = carry
        return l < l1

    _, _, cursor, curr = jax.lax.while_loop(
        lane_cond, lane_body,
        (l0, fetch_chunk(l0), rs, jnp.zeros((1, 128), jnp.int32)))
    vbuf[pl.ds(0, 1), :] = curr + cursor


run_variant("B control only", _frame(bodyB))
run_variant("C control+merge-reg", _frame(bodyC))
print("done", flush=True)
