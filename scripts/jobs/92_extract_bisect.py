"""Bisect extraction cost: stages E0..E4 of the expand3 tile loop."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from devtime import measure_cycled
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
TROWS = 16
CH_TILES = 8
CHROWS = 128
NTILES = 2048
ROWS = NTILES * TROWS
CONSEC = np.int32(1024)


def make(stage):
    def kernel(tok_hbm, o_ref, tbuf, stg, qv, sem):
        iota_r16 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 128), 0)
        iota_c16 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 128), 1)
        flat16 = iota_r16 * 128 + iota_c16
        iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def chunk_dma(ck, slot):
            return pltpu.make_async_copy(
                tok_hbm.at[pl.ds(ck * CHROWS, CHROWS), :],
                tbuf.at[pl.ds(slot * CHROWS, CHROWS), :], sem.at[slot])

        def seg_cumsums(x):
            inc = x
            for sh in (1, 2, 4, 8, 16):
                y = pltpu.roll(inc, sh, 1)
                inc = inc + jnp.where((iota_c16 & 31) >= sh, y, 0)
            return inc - x, inc

        def row_cumsums(x):
            inc = x
            for sh in (1, 2, 4, 8, 16, 32, 64):
                y = pltpu.roll(inc, sh, 1)
                inc = inc + jnp.where(iota_c16 >= sh, y, 0)
            return inc - x, inc

        chunk_dma(0, 0).start()

        def tile_body(t, carry):
            qtail, acc = carry
            ck = t // CH_TILES
            slot = ck & 1

            @pl.when((t % CH_TILES) == 0)
            def _():
                chunk_dma(ck, slot).wait()

                @pl.when((ck + 1) * CH_TILES < NTILES)
                def _():
                    chunk_dma(ck + 1, 1 - slot).start()

            tok = tbuf[pl.ds(slot * CHROWS + (t % CH_TILES) * TROWS,
                             TROWS), :]
            stg[pl.ds(0, TROWS), :] = (tok & 255).astype(jnp.bfloat16)
            if stage == 0:
                return qtail, acc + jnp.sum(tok[0:1, :1])

            kind = (tok >> 30) & 3
            is_lit = kind == 1
            is_m = kind == 2
            mlen = tok & 0x1FF
            dist = ((tok >> 9) & 0x7FFF) + 1
            slen = jnp.where(is_lit, 1, jnp.where(is_m, mlen, 0))
            exc, _ = seg_cumsums(slen)
            lane_local = iota_r16 * 4 + (iota_c16 >> 5)
            base = (t * 64) + lane_local * 0
            dsts = base + exc + lane_local
            if stage == 1:
                return qtail, acc + jnp.sum(dsts[0:1, :1])

            lit_i = is_lit.astype(jnp.int32)
            prev_lit = (pltpu.roll(lit_i, 1, 1) > 0) & ((iota_c16 & 31) > 0)
            run_start = is_lit & ~prev_lit
            _, lit_inc = seg_cumsums(lit_i)
            nxt_lit = (pltpu.roll(lit_i, 127, 1) > 0) & ((iota_c16 & 31) < 31)
            run_end = is_lit & ~nxt_lit
            segpos = iota_c16 & 31
            sfx = jnp.where(run_end, segpos, 32)
            for sh in (1, 2, 4, 8, 16):
                y = pltpu.roll(sfx, 128 - sh, 1)
                sfx = jnp.minimum(sfx, jnp.where(segpos <= 31 - sh, y, 32))
            run_len = sfx - segpos + 1
            is_item = run_start | is_m
            f_dst = dsts
            f_w = jnp.where(run_start, run_len, mlen)
            f_src = jnp.where(run_start, flat16, dsts - dist)
            f_per = jnp.where(run_start, CONSEC, dist)
            f_spc = jnp.where(run_start, 1, 0)
            if stage == 2:
                return qtail, acc + jnp.sum(f_w[0:1, :1] + f_src[0:1, :1])

            ii = is_item.astype(jnp.int32)
            _, rinc = row_cumsums(ii)
            rowtot = rinc[:, 127:128]
            lo = jnp.zeros_like(iota_c16)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                cand = lo + sh
                v = jnp.take_along_axis(rinc, jnp.clip(cand - 1, 0, 127),
                                        axis=1)
                lo = jnp.where((cand <= 127) & (v <= iota_c16), cand, lo)
            qmask = iota_c16 < rowtot
            cf = []
            for f in (f_dst, f_w, f_src, f_per, f_spc):
                cf.append(jnp.where(qmask,
                                    jnp.take_along_axis(f, lo, axis=1), 0))
            if stage == 3:
                s = cf[0][0:1, :1]
                for c in cf[1:]:
                    s = s + c[0:1, :1]
                return qtail, acc + jnp.sum(s)

            # stage 4: appends (cond + RMW)
            for r in range(TROWS):
                cnt_r = jnp.sum(rowtot[r:r + 1, :])

                def do_append(c):
                    qt, a2 = c
                    qpos = qt & 127
                    r0 = (qt >> 7) & 63
                    for fi in range(5):
                        rowv = cf[fi][r:r + 1, :]
                        rolled = pltpu.roll(rowv, qpos, 1)
                        mA = (iota1 >= qpos) & (iota1 < qpos + cnt_r)
                        mB = iota1 < qpos + cnt_r - 128
                        oldA = qv[pl.ds(fi * 64 + r0, 1), :]
                        qv[pl.ds(fi * 64 + r0, 1), :] = jnp.where(
                            mA, rolled, oldA)
                        oldB = qv[pl.ds(fi * 64 + ((r0 + 1) & 63), 1), :]
                        qv[pl.ds(fi * 64 + ((r0 + 1) & 63), 1), :] = (
                            jnp.where(mB, rolled, oldB))
                    return qt + cnt_r, a2

                qtail, acc = jax.lax.cond(cnt_r > 0, do_append,
                                          lambda c: c, (qtail, acc))
            return qtail, acc

        qtail, acc = jax.lax.fori_loop(0, NTILES, tile_body,
                                       (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc + qtail

    def run(tok2d):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2 * CHROWS, 128), jnp.int32),
                pltpu.VMEM((TROWS, 128), jnp.bfloat16),
                pltpu.VMEM((5 * 64, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(tok2d)
    return run


TOK_LIT = 1 << 30
TOK_MATCH = 2 << 30
sets = []
for s in range(2):
    tok = np.zeros((ROWS, 128), np.uint32)
    tok[:, 0] = TOK_LIT | 65
    tok[:, 1] = TOK_MATCH | 20 | (500 << 9)
    sets.append((jnp.asarray(tok.view(np.int32)),))

for stage in range(5):
    try:
        t = measure_cycled(sets, make(stage), iters=4)
        print(f"E{stage}: {t * 1e3:.2f} ms  ({t / NTILES * 1e9:.0f} ns/tile)",
              flush=True)
    except Exception as e:
        print(f"E{stage}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
print("done")
