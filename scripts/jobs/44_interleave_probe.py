"""Probe: does interleaving 2 independent token-expansion chains hide the
serial latency? Uses two genuinely independent decode batches as the two
chains (the production version would interleave independent encoder
segments). Measures 2x-sequential vs interleaved."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import faulthandler; faulthandler.dump_traceback_later(2000, exit=True)
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

base = B.make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = I.RawInflater(max_batch_bits=1 << 25, max_batch_blocks=512,
                    max_batch_out=1 << 23)

# build expand inputs for two variants x two "chains" (chains = first/second
# half of the corpus — independent enough for a latency probe)
sets = []
for shift in (0, 1):
    pair = []
    for half in (0, 1):
        d = bytearray(base[half * (4 << 20):(half + 1) * (4 << 20)])
        if shift:
            for p in range(100, len(d), 8192):
                d[p] ^= 1
        data = bytes(d)
        raw, idx = enc.compress(data)
        calls = []
        orig = I.decode_batch_windows
        I.decode_batch_windows = lambda *a, **k: (calls.append(a),
                                                  orig(*a, **k))[1]
        out = dec.decompress(raw, index=idx)
        I.decode_batch_windows = orig
        assert out == data
        a = calls[0]
        npe, ne, oc, up = a[8], a[9], a[10], a[11]
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
        pair.append((jax.device_put(tok_ann), jax.device_put(outlen),
                     jax.device_put(wn)))
    sets.append(tuple(x for p in pair for x in p))
    OC = oc
print("inputs built, oc", OC, flush=True)

# baseline: 2x sequential expand
def seq2(tokA, olA, wnA, tokB, olB, wnB):
    a = ex2.expand_tokens(tokA, olA, wnA, OC)
    b = ex2.expand_tokens(tokB, olB, wnB, OC)
    return a, b
t = measure_cycled(sets, seq2, iters=6)
print(f"SEQ 2x expand: {t*1e3:.2f} ms -> {2*OC/t/1e9:.3f} GB/s", flush=True)

# interleaved: one kernel, two chains stepped together
S = wk.S_SLOTS
RO = ex2.REGION_OUT
RROWS = ex2.RROWS
TCH = ex2.TCH
TCHL = ex2.TCHUNK_LANES
HALO = ex2.HALO
LANE_MAX_OUT = ex2.LANE_MAX_OUT


def _kernel2(lrA, roA, lrB, roB, tokA, tokB, bufA, bufB, outA, outB,
             vbufA, stageA, tsmA, tvmA, vbufB, stageB, tsmB, tvmB,
             semA1, semA2, semA3, semB1, semB2, semB3):
    r = pl.program_id(0)

    def setup(lr_ref, ro_ref, out_ref, stage, vbuf, sem):
        l0 = lr_ref[r]
        l1 = lr_ref[r + 1]
        rs = ro_ref[r]
        base_row = pl.multiple_of((((rs - HALO) >> 7) >> 5) << 5, 32)
        cp = pltpu.make_async_copy(
            out_ref.at[pl.ds(base_row, RROWS), :], stage, sem)
        cp.start()
        cp.wait()
        vbuf[:, :] = stage[:, :].astype(jnp.int32)
        return l0, l1, rs, base_row

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def make_chain(tok_hbm, vbuf, tsm, tvm, sem_t, sem_v, base_row):
        base = base_row << 7

        def fetch_chunk(l):
            cl0 = pl.multiple_of((l >> 5) << 5, 32)
            row0 = (cl0 * S) >> 7
            cp_t = pltpu.make_async_copy(
                tok_hbm.at[pl.ds(row0, TCH // 128), :], tsm, sem_t)
            cp_t.start()
            cp_v = pltpu.make_async_copy(
                tok_hbm.at[pl.ds(row0, TCH // 128 + 8), :], tvm, sem_v)
            cp_v.start()
            cp_t.wait()
            cp_v.wait()
            return cl0

        def merge(curr, crow, cursor, two, srcoff, w):
            doff = cursor - (crow << 7) - base
            w1 = jnp.minimum(w, 128 - doff)
            rolled = pltpu.roll(two, doff - srcoff, 1)[:, :128]
            sel = (lane1 >= doff) & (lane1 < doff + w1)
            curr = jnp.where(sel, rolled, curr)
            cursor = cursor + w1
            w2 = w - w1

            def adv(args):
                curr, crow = args
                vbuf[pl.ds(crow, 1), :] = curr
                curr = vbuf[pl.ds(crow + 1, 1), :]
                rolled2 = pltpu.roll(two, -(srcoff + w1), 1)[:, :128]
                curr = jnp.where(lane1 < w2, rolled2, curr)
                return curr, crow + 1

            curr, crow = jax.lax.cond(
                doff + w1 >= 128, adv, lambda a: a, (curr, crow))
            return curr, crow, cursor + w2

        def step_token(l, cl0, cursor, crow, curr):
            """One token for this chain; returns updated state + done."""
            cl0 = jax.lax.cond(l - cl0 >= TCHL,
                               lambda: fetch_chunk(l), lambda: cl0)
            tokbase = (l - cl0) * S
            return tokbase, cl0, merge

        return fetch_chunk, merge, base

    # Chain state: (l, s, cl0, cursor, crow, curr, active)
    l0A, l1A, rsA, brA = setup(lrA, roA, outA, stageA, vbufA, semA3)
    l0B, l1B, rsB, brB = setup(lrB, roB, outB, stageB, vbufB, semB3)
    fetchA, mergeA, baseA = make_chain(tokA, vbufA, tsmA, tvmA, semA1, semA2,
                                       brA)
    fetchB, mergeB, baseB = make_chain(tokB, vbufB, tsmB, tvmB, semB1, semB2,
                                       brB)

    def tok_step(tsm, tvm, vbuf, merge, base, l, s, cl0, cursor, crow, curr):
        tokbase = (l - cl0) * S
        ti0 = tokbase + s
        tok = tsm[ti0 >> 7, ti0 & 127]
        kind = (tok >> 30) & 3

        def do_lit(c2):
            cursor, crow, curr = c2
            cnt = (tok >> 8) & 63
            two = jnp.concatenate(
                [tvm[pl.ds(ti0 >> 7, 1), :],
                 tvm[pl.ds((ti0 >> 7) + 1, 1), :]], 1) & 0xFF
            curr, crow, cursor = merge(curr, crow, cursor, two, ti0 & 127,
                                       cnt)
            return s + cnt, cursor, crow, curr

        def do_match(c2):
            cursor, crow, curr = c2
            ln = tok & 0x1FF
            d = ((tok >> 9) & 0x7FFF) + 1

            def copy_cond(cc):
                written, dd, cursor, crow, curr = cc
                return written < ln

            def copy_body(cc):
                written, dd, cursor, crow, curr = cc
                w = jnp.minimum(jnp.minimum(ln - written, 128), dd)
                srcp = cursor - base - dd
                srow = srcp >> 7
                a = jnp.where(srow == crow, curr,
                              vbuf[pl.ds(jnp.minimum(srow, crow), 1), :])
                b = jnp.where(srow + 1 == crow, curr,
                              vbuf[pl.ds(jnp.minimum(srow + 1, crow), 1), :])
                two = jnp.concatenate([a, b], 1)
                curr, crow, cursor = merge(curr, crow, cursor, two,
                                           srcp & 127, w)
                wn = written + w
                dd2 = jnp.where(dd * 2 <= wn + d, dd * 2, dd)
                return wn, dd2, cursor, crow, curr

            _, _, cursor, crow, curr = jax.lax.while_loop(
                copy_cond, copy_body,
                (jnp.int32(0), jnp.maximum(d, 1), cursor, crow, curr))
            return s + 1, cursor, crow, curr

        s2, cursor2, crow2, curr2 = jax.lax.cond(
            kind == wk.TOK_LIT, do_lit, do_match, (cursor, crow, curr))
        s2 = jnp.where(kind == 0, S, s2)
        return s2, cursor2, crow2, curr2

    def chain_adv(fetch, st):
        l, s, cl0, cursor, crow, curr, l1 = st
        lane_done = s >= S
        l = l + lane_done.astype(jnp.int32)
        s = jnp.where(lane_done, 0, s)
        cl0 = jax.lax.cond((l - cl0 >= TCHL) & (l < l1),
                           lambda: fetch(l), lambda: cl0)
        return (l, s, cl0, cursor, crow, curr, l1)

    def cond(c):
        stA, stB = c
        return (stA[0] < stA[6]) | (stB[0] < stB[6])

    def body(c):
        stA, stB = c
        lA, sA, clA, curA, crA, cuA, l1A_ = stA
        lB, sB, clB, curB, crB, cuB, l1B_ = stB

        def stepA(args):
            sA, curA, crA, cuA = args
            return tok_step(tsmA, tvmA, vbufA, mergeA, baseA,
                            lA, sA, clA, curA, crA, cuA)

        sA, curA, crA, cuA = jax.lax.cond(
            lA < l1A_, stepA, lambda a: (jnp.int32(S), a[1], a[2], a[3]),
            (sA, curA, crA, cuA))

        def stepB(args):
            sB, curB, crB, cuB = args
            return tok_step(tsmB, tvmB, vbufB, mergeB, baseB,
                            lB, sB, clB, curB, crB, cuB)

        sB, curB, crB, cuB = jax.lax.cond(
            lB < l1B_, stepB, lambda a: (jnp.int32(S), a[1], a[2], a[3]),
            (sB, curB, crB, cuB))

        stA = chain_adv(fetchA, (lA, sA, clA, curA, crA, cuA, l1A_))
        stB = chain_adv(fetchB, (lB, sB, clB, curB, crB, cuB, l1B_))
        return stA, stB

    stA0 = (l0A, jnp.int32(0), fetchA(l0A), rsA, (rsA - (brA << 7)) >> 7,
            vbufA[pl.ds((rsA - (brA << 7)) >> 7, 1), :], l1A)
    stB0 = (l0B, jnp.int32(0), fetchB(l0B), rsB, (rsB - (brB << 7)) >> 7,
            vbufB[pl.ds((rsB - (brB << 7)) >> 7, 1), :], l1B)
    stA, stB = jax.lax.while_loop(cond, body, (stA0, stB0))
    vbufA[pl.ds(stA[4], 1), :] = stA[5]
    vbufB[pl.ds(stB[4], 1), :] = stB[5]

    stageA[:, :] = vbufA[:, :].astype(jnp.uint8)
    brA_ = pl.multiple_of((((roA[r] - HALO) >> 7) >> 5) << 5, 32)
    cp1 = pltpu.make_async_copy(stageA, outA.at[pl.ds(brA_, RROWS), :], semA3)
    cp1.start()
    stageB[:, :] = vbufB[:, :].astype(jnp.uint8)
    brB_ = pl.multiple_of((((roB[r] - HALO) >> 7) >> 5) << 5, 32)
    cp2 = pltpu.make_async_copy(stageB, outB.at[pl.ds(brB_, RROWS), :], semB3)
    cp2.start()
    cp1.wait()
    cp2.wait()


def expand2x(tokA, olA, wnA, tokB, olB, wnB):
    outs = []
    prepped = []
    for tok_lm, outlen, halo in ((tokA, olA, wnA), (tokB, olB, wnB)):
        L = tok_lm.shape[0]
        nreg = -(-OC // RO)
        laneoff = HALO + jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])
        bounds = HALO + jnp.arange(nreg + 1, dtype=jnp.int32) * RO
        lr = jnp.clip(jnp.searchsorted(
            laneoff, jnp.minimum(bounds, laneoff[L]),
            side="left").astype(jnp.int32), 0, L)
        regoff = laneoff[lr]
        rows_n = -(-(HALO + OC + LANE_MAX_OUT) // 128) + RROWS + 32
        val = jnp.zeros(rows_n * 128, jnp.uint8).at[:HALO].set(halo)
        Lpad = -(-L // 32) * 32
        tok_i = jax.lax.bitcast_convert_type(tok_lm, jnp.int32)
        tok_flat = jnp.zeros(Lpad * S + TCH + 2048, jnp.int32)
        tok_flat = tok_flat.at[:L * S].set(tok_i.reshape(-1))
        prepped.append((lr, regoff, tok_flat.reshape(-1, 128),
                        val.reshape(rows_n, 128), rows_n, nreg))
    lrA, roA, tokA2, valA, rowsA, nreg = prepped[0]
    lrB, roB, tokB2, valB, rowsB, _ = prepped[1]
    oA, oB = pl.pallas_call(
        _kernel2,
        grid=(nreg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rowsA, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((rowsB, 128), jnp.uint8)],
        scratch_shapes=[
            pltpu.VMEM((RROWS, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.uint8),
            pltpu.SMEM((TCH // 128, 128), jnp.int32),
            pltpu.VMEM((TCH // 128 + 8, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.uint8),
            pltpu.SMEM((TCH // 128, 128), jnp.int32),
            pltpu.VMEM((TCH // 128 + 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lrA, roA, lrB, roB, tokA2, tokB2, valA, valB)
    return (oA.reshape(-1)[HALO:HALO + OC], oB.reshape(-1)[HALO:HALO + OC])


# correctness check vs sequential
refA, _ = jax.jit(lambda t, o, w: ex2.expand_tokens(t, o, w, OC))(
    *sets[0][:3])
refB, _ = jax.jit(lambda t, o, w: ex2.expand_tokens(t, o, w, OC))(
    *sets[0][3:])
try:
    gA, gB = jax.jit(expand2x)(*sets[0])
    okA = bool(jnp.array_equal(gA, refA))
    okB = bool(jnp.array_equal(gB, refB))
    print("interleaved correct:", okA and okB, okA, okB, flush=True)
    t = measure_cycled(sets, expand2x, iters=6)
    print(f"ILV 2x expand: {t*1e3:.2f} ms -> {2*OC/t/1e9:.3f} GB/s", flush=True)
except Exception as e:
    print("ILV FAIL:", type(e).__name__, str(e).splitlines()[0][:200],
          flush=True)
print("done", flush=True)
