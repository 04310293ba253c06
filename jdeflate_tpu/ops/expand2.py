"""Token-expansion kernel v2: lane-major walk tokens -> output bytes.

Consumes the window walk's lane-major token rows directly (ops/walk.py) —
no slot sort, no literal scatter, no pointer-doubling: the decode-side
assembly the round-2 path did with XLA scatters/gathers (measured
0.14 G elem/s on v5e) becomes one sequential-in-VMEM pass.

Reference behavior reproduced (never translated): the inflator's output
loop — literal stores and back-reference copies with the overlapping-copy
wavefront (decodefast, /root/reference/src/inflator.c:1678-1812; copybytes
:1213-1290).

Design:
  * tokens per lane are a prefix of S_SLOTS u32 slots (kind<<30 | fields);
    literal runs were annotated by walk.annotate_lit_runs, so one iteration
    copies a whole run (the run bytes ARE the token row's low bytes);
  * the output is processed in 64 KiB regions, each staged in VMEM with the
    32 KiB window halo (matches cross block/region boundaries exactly like
    the reference's ring window, inflator.c:616-675); regions are processed
    in grid order so every halo byte is final when read;
  * a region's lanes are those whose output STARTS inside it; the last lane
    may run past the boundary (max one lane's output), covered by slack rows
    that the next region re-reads as part of its prefix;
  * token rows stream through VMEM in chunks (a region can span many lanes).
Mosaic constraints shape the code exactly as in the round-2 expand kernel:
row(+pair) loads with dynamic sublane starts, pltpu.roll for lane shifts,
masked row read-modify-writes for unaligned stores.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from . import walk as wk

HALO = C.WINDOW_SIZE                  # 32768
REGION_OUT = 1 << 16                  # output bytes per grid step
LANE_MAX_OUT = wk.S_SLOTS * C.MAX_MATCH  # one lane's maximum output
# stage rows: 32 alignment slack + 256 halo + 512 region + straddle, %32 == 0
RROWS = 32 + 256 + 512 + (LANE_MAX_OUT // 128 + 2 + 30) // 32 * 32
TCHUNK_LANES = 2048                   # token lanes DMA'd per chunk
TROWS = TCHUNK_LANES // 4             # 4 lanes (32 slots) per 128-lane row


def _expand_kernel(lr_ref, regoff_ref, tok_hbm, buf_hbm, out_ref,
                   vbuf, stage, tvm, sem_t, sem_b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = pl.program_id(0)
    l0 = lr_ref[r]
    l1 = lr_ref[r + 1]
    rs = regoff_ref[r]

    base_row = pl.multiple_of((((rs - HALO) >> 7) >> 5) << 5, 32)
    base = base_row << 7

    cp_b = pltpu.make_async_copy(
        out_ref.at[pl.ds(base_row, RROWS), :], stage, sem_b)
    cp_b.start()
    cp_b.wait()
    vbuf[:, :] = stage[:, :].astype(jnp.int32)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    def row_pair(ref, row):
        return jnp.concatenate(
            [ref[pl.ds(row, 1), :], ref[pl.ds(row + 1, 1), :]], axis=1)

    def fetch_chunk(cl0):
        trow0 = pl.multiple_of(((cl0 >> 2) >> 3) << 3, 8)
        cp_t = pltpu.make_async_copy(
            tok_hbm.at[pl.ds(trow0, TROWS), :], tvm, sem_t)
        cp_t.start()
        cp_t.wait()
        return trow0 << 2          # first lane resident in tvm

    def lane_body(carry):
        l, cl0, cursor = carry
        cl0 = jax.lax.cond(l - cl0 >= TCHUNK_LANES - 32,
                           lambda: fetch_chunk(l), lambda: cl0)
        lrow = (l - cl0) >> 2
        lsub = (l & 3) * 32
        trow = tvm[pl.ds(lrow, 1), :]
        litrow = trow & 0xFF

        def tok_cond(c):
            s, cursor = c
            return s < wk.S_SLOTS

        def tok_body(c):
            s, cursor = c
            tok = pltpu.roll(trow, -(lsub + s), 1)[0, 0]
            kind = (tok >> 30) & 3

            def do_lit(cursor):
                cnt = (tok >> 8) & 63
                src = pltpu.roll(litrow, -(lsub + s), 1)[:, :128]
                doff = cursor & 127
                wide = pltpu.roll(jnp.concatenate([src, src], 1), doff, 1)
                sel = (lane2 >= doff) & (lane2 < doff + cnt)
                drow = (cursor >> 7) - base_row
                old = row_pair(vbuf, drow)
                new = jnp.where(sel, wide, old)
                vbuf[pl.ds(drow, 1), :] = new[:, :128]
                vbuf[pl.ds(drow + 1, 1), :] = new[:, 128:]
                return s + cnt, cursor + cnt

            def do_match(cursor):
                ln = tok & 0x1FF
                d = ((tok >> 9) & 0x7FFF) + 1
                cur0 = cursor - base

                def copy_cond(cc):
                    written, _ = cc
                    return written < ln

                def copy_body(cc):
                    written, dd = cc
                    w = jnp.minimum(jnp.minimum(ln - written, 128), dd)
                    cur = cur0 + written
                    srcp = cur - dd
                    two = row_pair(vbuf, srcp >> 7)
                    chunk = pltpu.roll(two, -(srcp & 127), 1)[:, :128]
                    doff = cur & 127
                    wide = pltpu.roll(
                        jnp.concatenate([chunk, chunk], 1), doff, 1)
                    sel = (lane2 >= doff) & (lane2 < doff + w)
                    drow = cur >> 7
                    old = row_pair(vbuf, drow)
                    new = jnp.where(sel, wide, old)
                    vbuf[pl.ds(drow, 1), :] = new[:, :128]
                    vbuf[pl.ds(drow + 1, 1), :] = new[:, 128:]
                    wn = written + w
                    # dd stays a multiple of d and <= written + d so the
                    # source window never leaves the match's periodic region
                    dd2 = jnp.where(dd * 2 <= wn + d, dd * 2, dd)
                    return wn, dd2

                jax.lax.while_loop(copy_cond, copy_body,
                                   (jnp.int32(0), jnp.maximum(d, 1)))
                return s + 1, cursor + ln

            s2, cursor2 = jax.lax.cond(kind == wk.TOK_LIT, do_lit,
                                       do_match, cursor)
            # kind 0 (empty) terminates the lane
            s2 = jnp.where(kind == 0, wk.S_SLOTS, s2)
            cursor2 = jnp.where(kind == 0, cursor, cursor2)
            return s2, cursor2

        _, cursor = jax.lax.while_loop(tok_cond, tok_body,
                                       (jnp.int32(0), cursor))
        return l + 1, cl0, cursor

    def lane_cond(carry):
        l, cl0, cursor = carry
        return l < l1

    jax.lax.while_loop(lane_cond, lane_body,
                       (l0, fetch_chunk(l0), rs))

    stage[:, :] = vbuf[:, :].astype(jnp.uint8)
    cp_o = pltpu.make_async_copy(
        stage, out_ref.at[pl.ds(base_row, RROWS), :], sem_b)
    cp_o.start()
    cp_o.wait()


def expand_tokens(tok_lm: jnp.ndarray, outlen: jnp.ndarray,
                  halo: jnp.ndarray, out_cap: int):
    """Expand lane-major annotated tokens into output bytes.

    tok_lm: (L, S_SLOTS) u32, run-annotated (walk.annotate_lit_runs).
    outlen: (L,) i32 per-lane output bytes.
    halo: (HALO,) u8 history.
    Returns (out (out_cap,) u8, produced i32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = tok_lm.shape[0]
    nreg = -(-out_cap // REGION_OUT)
    laneoff = HALO + jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])
    produced = laneoff[L] - HALO
    bounds = HALO + jnp.arange(nreg + 1, dtype=jnp.int32) * REGION_OUT
    lr = jnp.searchsorted(laneoff, jnp.minimum(bounds, laneoff[L]),
                          side="left").astype(jnp.int32)
    # a region's first lane is the one whose output contains (or starts at)
    # the boundary; searchsorted(left) gives first lane with off >= bound —
    # step back one when the previous lane straddles the boundary... regions
    # partition by lane START: lane l belongs to region of laneoff[l]. The
    # boundary between regions r/r+1 is the first lane starting at/after
    # bounds[r+1]:
    lr = jnp.clip(lr, 0, L)
    regoff = laneoff[lr]

    rows_n = -(-(HALO + out_cap + LANE_MAX_OUT) // 128) + RROWS + 32
    N = rows_n * 128
    val = jnp.zeros(N, jnp.uint8).at[:HALO].set(halo)

    # pad token rows so any TROWS-row chunk DMA stays in bounds
    Lpad = -(-L // 4) * 4
    tok_i = jax.lax.bitcast_convert_type(tok_lm, jnp.int32)
    tok_rows = jnp.zeros((Lpad // 4 + TROWS + 8, 128), jnp.int32)
    tok_rows = tok_rows.at[:Lpad // 4, :].set(
        jnp.pad(tok_i, ((0, Lpad - L), (0, 0))).reshape(Lpad // 4, 128))

    out2d = pl.pallas_call(
        _expand_kernel,
        grid=(nreg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # lr
            pl.BlockSpec(memory_space=pltpu.SMEM),     # regoff
            pl.BlockSpec(memory_space=pltpu.ANY),      # tokens (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # buffer (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((rows_n, 128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((RROWS, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.uint8),
            pltpu.VMEM((TROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lr, regoff, tok_rows, val.reshape(rows_n, 128))
    out = out2d.reshape(-1)[HALO:HALO + out_cap]
    return out, produced
