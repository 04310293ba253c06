"""Pallas LZ match-expansion kernel (the decode-side hot loop).

Reference behavior reproduced (never translated): the inflator's back-
reference copy — chunked copies for large distances and the wavefront
overlapping copy for dist < chunk (decodefast, src/inflator.c:1678-1812;
copybytes, src/inflator.c:1213-1290).

TPU-first design: literals are pre-placed by one XLA scatter; matches are
expanded by a sequential in-VMEM loop, one 64 KiB block per grid step.
Pointer-doubling over the whole output (the previous design) costs
rounds x 2 full-buffer gathers at ~133M elem/s; this kernel costs roughly
one short vector-op chain per 128-byte chunk. Mosaic constraints shape the
code: no scalar or unaligned VMEM access, so every random read is a
dynamic-sublane row(+pair) load plus a dynamic rotate, every random write a
masked row read-modify-write, and token fields ride 4-per-token in 128-lane
rows.

Each grid step DMAs the block's 32 KiB window + output region HBM->VMEM,
expands its matches in order, and DMAs the block rows back; the sequential
grid order makes the window (which crosses block boundaries, like the
reference's ring window inflator.c:616-675) already-final when read.
Overlapping matches (dist < len, RLE-style) copy with a doubling chunk
width: chunk w <= dd where dd starts at dist and doubles, every copy
reading only finalized bytes while the effective period stays dist.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C

HALO = C.WINDOW_SIZE                 # 32768
HROWS = HALO // 128                  # 256
# region = 32 alignment slack + halo + block output (+straddle), rows padded
# to the u8 sublane tile (32) because DMA slice starts/sizes must be
# tile-aligned
RROWS = 832                          # 32 + 256 + 513 straddle-safe, %32 == 0
REGION = RROWS * 128
TROWS = 696                          # token rows per block (32 tokens/row)


def _expand_kernel(rng_ref, tok_hbm, buf_hbm, out_ref, vbuf, stage, tvm,
                   sem_t, sem_b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t0 = rng_ref[b * 4 + 0]
    t1 = rng_ref[b * 4 + 1]
    out_s = rng_ref[b * 4 + 2]

    # DMA row starts must be tile-aligned: 32 for u8 region rows, 8 for i32
    # token rows; the region carries 32 rows of leading slack for this
    base_row = pl.multiple_of((((out_s - HALO) >> 7) >> 5) << 5, 32)
    trow0 = pl.multiple_of(((t0 >> 5) >> 3) << 3, 8)

    cp_t = pltpu.make_async_copy(
        tok_hbm.at[pl.ds(trow0, TROWS), :], tvm, sem_t)
    cp_t.start()
    cp_b = pltpu.make_async_copy(
        out_ref.at[pl.ds(base_row, RROWS), :], stage, sem_b)
    cp_b.start()
    cp_t.wait()
    cp_b.wait()
    vbuf[:, :] = stage[:, :].astype(jnp.int32)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    base = base_row << 7

    def row_pair(ref, row):
        return jnp.concatenate(
            [ref[pl.ds(row, 1), :], ref[pl.ds(row + 1, 1), :]], axis=1)

    def body(t, _):
        lt = t - (trow0 << 5)
        tr = pltpu.roll(row_pair(tvm, lt >> 5), -((lt & 31) * 4), 1)
        g_off = tr[0, 0]
        d = tr[0, 1]
        ln = tr[0, 2]
        cur0 = g_off - base

        def copy_cond(c):
            written, _ = c
            return written < ln

        def copy_body(c):
            written, dd = c
            w = jnp.minimum(jnp.minimum(ln - written, 128), dd)
            cur = cur0 + written
            src = cur - dd                    # dd multiple of d, fully final
            two = row_pair(vbuf, src >> 7)
            chunk = pltpu.roll(two, -(src & 127), 1)[:, :128]
            doff = cur & 127
            wide = pltpu.roll(jnp.concatenate([chunk, chunk], 1), doff, 1)
            sel = (lane2 >= doff) & (lane2 < doff + w)
            drow = cur >> 7
            old = row_pair(vbuf, drow)
            new = jnp.where(sel, wide, old)
            vbuf[pl.ds(drow, 1), :] = new[:, :128]
            vbuf[pl.ds(drow + 1, 1), :] = new[:, 128:]
            # dd must stay a multiple of d AND <= written+d so the source
            # window never leaves the match's periodic region [cur0-d, cur):
            # double only while that bound allows it
            wn = written + w
            dd2 = jnp.where(dd * 2 <= wn + d, dd * 2, dd)
            return wn, dd2

        jax.lax.while_loop(copy_cond, copy_body,
                           (jnp.int32(0), jnp.maximum(d, 1)))
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)

    stage[:, :] = vbuf[:, :].astype(jnp.uint8)
    # whole-region writeback: halo/slack rows were not modified and trailing
    # rows hold bytes identical to HBM, so rewriting them is safe — and it
    # keeps the DMA slice tile-aligned
    cp_o = pltpu.make_async_copy(
        stage, out_ref.at[pl.ds(base_row, RROWS), :], sem_b)
    cp_o.start()
    cp_o.wait()


def expand_matches(val2d: jnp.ndarray, toks4: jnp.ndarray,
                   ranges: jnp.ndarray, nblocks: int):
    """Expand matches in-place over `val2d` (u8 (rows,128), literals placed).

    val2d must have >= RROWS trailing slack rows beyond the last block's
    output. toks4: (trows, 128) i32, token t at row t//32 lanes (t%32)*4..+3
    as (abs_off, dist, len, 0), with >= TROWS+1 slack rows. ranges:
    (nblocks*4,) i32 [tok_start, tok_end, out_start(+HALO), unused] per
    block, out_start strictly increasing, block output <= 64 KiB.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _expand_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # ranges
            pl.BlockSpec(memory_space=pltpu.ANY),      # tokens (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # buffer (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(val2d.shape, jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((RROWS, 128), jnp.int32),
            pltpu.VMEM((RROWS, 128), jnp.uint8),
            pltpu.VMEM((TROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges, toks4, val2d)
