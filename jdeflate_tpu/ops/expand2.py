"""Token-expansion kernel v3: lane-major walk tokens -> output bytes.

Consumes the window walk's lane-major token rows directly (ops/walk.py) —
no slot sort, no literal scatter, no pointer-doubling: the decode-side
assembly the round-2 path did with XLA scatters/gathers (measured
0.14 G elem/s on v5e) becomes one sequential-in-VMEM pass.

Reference behavior reproduced (never translated): the inflator's output
loop — literal stores and back-reference copies with the overlapping-copy
wavefront (decodefast, /root/reference/src/inflator.c:1678-1812; copybytes
:1213-1290).

v3 design notes (measured on v5e, scripts/jobs/39-40):
  * token CONTROL reads ride SMEM: a dependent scalar load+arith chain runs
    ~10 ns/step vs ~50 cycles for a dynamic-roll + vreg->sreg extract, so
    token words are DMA'd HBM->SMEM in 512-lane chunks (a VMEM copy of the
    same chunk supplies literal-run BYTES for vector copies);
  * the current output row accumulates in a VECTOR REGISTER and spills to
    VMEM once per 128 bytes — adjacent tokens otherwise serialize on
    read-modify-writes of the same VMEM row (~16-token dependency chains);
  * literal runs (annotated by walk.annotate_lit_runs) and match chunks
    share one merge path: rotate a 256-wide source window into place and
    mask-merge into the register row;
  * the output is processed in 64 KiB regions staged in VMEM with the
    32 KiB window halo (matches cross region boundaries exactly like the
    reference's ring window, inflator.c:616-675); regions run in grid order
    so halo bytes are final when read.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from . import walk as wk

HALO = C.WINDOW_SIZE                  # 32768
REGION_OUT = 1 << 18                  # output bytes per grid step
LANE_MAX_OUT = wk.S_SLOTS * C.MAX_MATCH  # one lane's maximum output
# stage rows: 32 alignment slack + 256 halo + region + straddle, %32 == 0
RROWS = 32 + 256 + REGION_OUT // 128 + (LANE_MAX_OUT // 128 + 2 + 30) // 32 * 32
TCHUNK_LANES = 512                    # token lanes per SMEM chunk
TCH = TCHUNK_LANES * wk.S_SLOTS       # i32 tokens per chunk (16384 = 64 KiB)


def _expand_kernel(lr_ref, regoff_ref, tok2d_hbm, buf_hbm, out_ref,
                   vbuf, stage, tsm, tvm, sem_t, sem_v, sem_b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = wk.S_SLOTS
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

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def fetch_chunk(l):
        cl0 = pl.multiple_of((l >> 5) << 5, 32)    # 32-lane aligned
        row0 = (cl0 * S) >> 7
        cp_t = pltpu.make_async_copy(
            tok2d_hbm.at[pl.ds(row0, TCH // 128), :], tsm, sem_t)
        cp_t.start()
        cp_v = pltpu.make_async_copy(
            tok2d_hbm.at[pl.ds(row0, TCH // 128 + 8), :], tvm, sem_v)
        cp_v.start()
        cp_t.wait()
        cp_v.wait()
        return cl0

    def spill(crow, curr):
        vbuf[pl.ds(crow, 1), :] = curr

    def load_row(crow):
        return vbuf[pl.ds(crow, 1), :]

    def merge(curr, crow, cursor, two, srcoff, w):
        """Merge w (<=128) source bytes (two: (1,256) i32, window start at
        srcoff) into the register row at output position cursor. Returns
        (curr, crow, cursor). May spill once (w never crosses 2 rows)."""
        doff = cursor - (crow << 7) - base         # in [0, 128)
        w1 = jnp.minimum(w, 128 - doff)
        rolled = pltpu.roll(two, doff - srcoff, 1)[:, :128]
        sel = (lane1 >= doff) & (lane1 < doff + w1)
        curr = jnp.where(sel, rolled, curr)
        cursor = cursor + w1

        # row-boundary crossing is the rare case (~once per 128 output
        # bytes): spill, advance, and merge the tail inside one branch so
        # the common path pays no second roll
        w2 = w - w1

        def adv(args):
            curr, crow = args
            spill(crow, curr)
            curr = load_row(crow + 1)
            rolled2 = pltpu.roll(two, -(srcoff + w1), 1)[:, :128]
            curr = jnp.where(lane1 < w2, rolled2, curr)
            return curr, crow + 1

        curr, crow = jax.lax.cond(
            doff + w1 >= 128, adv, lambda a: a, (curr, crow))
        return curr, crow, cursor + w2

    def lane_body(carry):
        l, cl0, cursor, crow, curr = carry
        cl0 = jax.lax.cond(l - cl0 >= TCHUNK_LANES,
                           lambda: fetch_chunk(l), lambda: cl0)
        tokbase = (l - cl0) * S

        def tok_cond(c):
            s, cursor, crow, curr = c
            return s < S

        def tok_body(c):
            s, cursor, crow, curr = c
            ti0 = tokbase + s
            tok = tsm[ti0 >> 7, ti0 & 127]
            kind = (tok >> 30) & 3

            def do_lit(c2):
                cursor, crow, curr = c2
                cnt = (tok >> 8) & 63
                # lit bytes: the chunk's token words' low bytes, in VMEM
                # (a run may cross a 128-token row: read the pair)
                two = jnp.concatenate(
                    [tvm[pl.ds(ti0 >> 7, 1), :],
                     tvm[pl.ds((ti0 >> 7) + 1, 1), :]], 1) & 0xFF
                curr, crow, cursor = merge(curr, crow, cursor, two,
                                           ti0 & 127, cnt)
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
                    # sources at/after the register row read the register
                    a = jnp.where(srow == crow, curr,
                                  vbuf[pl.ds(jnp.minimum(srow, crow), 1), :])
                    b = jnp.where(srow + 1 == crow, curr,
                                  vbuf[pl.ds(jnp.minimum(srow + 1, crow), 1),
                                       :])
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
            s2 = jnp.where(kind == 0, S, s2)    # empty slot terminates lane
            return s2, cursor2, crow2, curr2

        s, cursor, crow, curr = jax.lax.while_loop(
            tok_cond, tok_body, (jnp.int32(0), cursor, crow, curr))
        return l + 1, cl0, cursor, crow, curr

    def lane_cond(carry):
        l, cl0, cursor, crow, curr = carry
        return l < l1

    crow0 = (rs - base) >> 7
    _, _, cursor, crow, curr = jax.lax.while_loop(
        lane_cond, lane_body,
        (l0, fetch_chunk(l0), rs, crow0, load_row(crow0)))
    spill(crow, curr)

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
    S = wk.S_SLOTS
    nreg = -(-out_cap // REGION_OUT)
    laneoff = HALO + jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])
    produced = laneoff[L] - HALO
    bounds = HALO + jnp.arange(nreg + 1, dtype=jnp.int32) * REGION_OUT
    lr = jnp.searchsorted(laneoff, jnp.minimum(bounds, laneoff[L]),
                          side="left").astype(jnp.int32)
    lr = jnp.clip(lr, 0, L)
    regoff = laneoff[lr]

    rows_n = -(-(HALO + out_cap + LANE_MAX_OUT) // 128) + RROWS + 32
    val = jnp.zeros(rows_n * 128, jnp.uint8).at[:HALO].set(halo)

    # flat token array padded so any TCH(+8 rows)-slice DMA stays in bounds
    Lpad = -(-L // 32) * 32
    tok_i = jax.lax.bitcast_convert_type(tok_lm, jnp.int32)
    tok_flat = jnp.zeros(Lpad * S + TCH + 2048, jnp.int32)
    tok_flat = tok_flat.at[:L * S].set(tok_i.reshape(-1))
    tok2d = tok_flat.reshape(-1, 128)

    out2d = pl.pallas_call(
        _expand_kernel,
        grid=(nreg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # lr
            pl.BlockSpec(memory_space=pltpu.SMEM),     # regoff
            pl.BlockSpec(memory_space=pltpu.ANY),      # tokens (HBM, rows)
            pl.BlockSpec(memory_space=pltpu.ANY),      # buffer (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((rows_n, 128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((RROWS, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.uint8),
            pltpu.SMEM((TCH // 128, 128), jnp.int32),
            pltpu.VMEM((TCH // 128 + 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lr, regoff, tok2d, val.reshape(rows_n, 128))
    out = out2d.reshape(-1)[HALO:HALO + out_cap]
    return out, produced
