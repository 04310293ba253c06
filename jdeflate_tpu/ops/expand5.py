"""Token-expansion engine v5: per-position plan + MXU windowed-gather resolve.

Replaces the serial in-VMEM walk of ops/expand2.py (v3, ~135 ns/token —
serial control is what a TPU is worst at) with a mostly-parallel pipeline:

  1. slot attrs (XLA): per-slot output offset (cumsum) + packed seed
     (literal byte / match distance), straight from the walk's lane-major
     tokens; no compaction.
  2. seed kernel (Pallas): monotone scatter of seeds to their output
     positions — sequential over slot rows, one-hot matvec per row
     (slot occupancy bounded by the (L, 8) slot slice; rare lanes with
     more than 8 symbols per 32-bit window ride a flagged spill pass).
  3. butterfly propagate (XLA): every output position learns its covering
     token's pack and its phase within it, in 9 shift/select stages
     (a DEFLATE item is at most 258 bytes — RFC 1951; cf. MAXMATCH,
     /root/reference/src/deflator.c:21-45 — so 9 doubling steps suffice).
  4. resolve kernel (Pallas): sequential 2 KiB steps over the output;
     per step ONE one-hot bf16 matmul gathers every position's source
     byte from the last-36 KiB window in VMEM (exact: bytes <= 255 are
     exact in bf16), then fixpoint rounds resolve intra-step chains
     (the reference handles the same chains byte-serially in its
     overlapped-copy loop, /root/reference/src/inflator.c:1747-1753).

The collapsed source rule: a position p inside a match (off, d, len) reads
from src = off - d + (p - off) % d, which always precedes the match, so
chains only cross token boundaries (nesting), never self-overlap.

walk-token format (ops/walk.py): u32, bits 30:32 kind (1=lit, 2=match);
lit: byte in 0:8; match: len in 0:9, dist-1 in 9:24.

Seed/plan pack (i32):
  bit 25: valid; bit 24: is_lit
  lit:   byte in bits 0:8
  match: dist-1 in bits 0:15, phase (p - off) in bits 15:24
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from . import walk as wk

HALO = C.WINDOW_SIZE                  # 32768
S_CAP = 8          # seed fast-pass slot slice; spill pass covers the rest
STEP = 2048        # resolve step bytes (16 output rows)
V_VALID = np.int32(1 << 25)
V_LIT = np.int32(1 << 24)
MAX_ROUNDS = 256   # intra-step fixpoint cap; exceeding -> error -> fallback


def slot_attrs(tok_lm: jnp.ndarray, outlen: jnp.ndarray):
    """(L, S) walk tokens + (L,) outlen -> flat slot (off, seed) arrays.

    off: (L*S,) i32 output position of each slot's token (batch-relative,
      garbage-but-monotone for empty slots: they inherit the running off).
    seed: (L*S,) i32 plan pack (0 for empty slots).
    """
    kind = (tok_lm >> 30).astype(jnp.int32)
    is_lit = kind == wk.TOK_LIT
    is_m = kind == wk.TOK_MATCH
    ln = jnp.where(is_lit, 1,
                   jnp.where(is_m, (tok_lm & 0x1FF).astype(jnp.int32), 0))
    within = jnp.cumsum(ln, axis=1) - ln
    laneoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])[:-1]
    off = laneoff[:, None] + within
    dm1 = ((tok_lm >> 9) & 0x7FFF).astype(jnp.int32)
    lit = (tok_lm & 0xFF).astype(jnp.int32)
    seed = jnp.where(
        is_lit, V_VALID | V_LIT | lit,
        jnp.where(is_m, V_VALID | dm1, 0))
    return off.reshape(-1), seed.reshape(-1)


def propagate(S: jnp.ndarray) -> jnp.ndarray:
    """Butterfly: fill every position with its covering token's pack +
    accumulated phase. 9 stages (items <= 258 bytes)."""
    for b in range(9):
        sh = 1 << b
        shifted = jnp.concatenate([jnp.zeros(sh, S.dtype), S[:-sh]])
        shifted = jnp.where((shifted & V_VALID) != 0,
                            shifted + (sh << 15), 0)
        S = jnp.where((S & V_VALID) != 0, S, shifted)
    return S


def plan_fields(P: jnp.ndarray, n: int):
    """P (n,) plan packs -> (is_lit, lit, src) with src batch-relative
    (may be negative: into the halo)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    valid = (P & V_VALID) != 0
    is_lit = valid & ((P & V_LIT) != 0)
    lit = P & 0xFF
    d = (P & 0x7FFF) + 1
    phase = (P >> 15) & 0x1FF
    off = pos - phase
    # phase % d without integer division: phase <= 511; for d > phase the
    # mod is phase itself; else exact f32 divide + one correction step
    q = jnp.floor(phase.astype(jnp.float32)
                  / d.astype(jnp.float32)).astype(jnp.int32)
    r = phase - q * d
    r = jnp.where(r < 0, r + d, r)
    r = jnp.where(r >= d, r - d, r)
    src = off - d + jnp.where(phase < d, phase, r)
    is_m = valid & ~is_lit
    return is_lit, lit, jnp.where(is_m, src, pos), is_m


def seed_scatter_ref(off, seed, n: int):
    """Referee seed placement (XLA scatter; kernels replace this on TPU)."""
    valid = (seed & V_VALID) != 0
    idx = jnp.where(valid & (off < n), off, n)
    return jnp.zeros(n + 1, jnp.int32).at[idx].max(
        seed, mode="drop")[:n]


def resolve_ref(P, halo, out_cap: int):
    """Referee resolve: global fixpoint value iteration (converges in
    max-chain-depth rounds; the kernel does this per 2 KiB step)."""
    is_lit, lit, src, is_m = plan_fields(P, out_cap)
    buf = jnp.concatenate(
        [halo.astype(jnp.int32), jnp.where(is_lit, lit, 0)])
    srch = jnp.clip(src + HALO, 0, HALO + out_cap - 1)

    def body(state):
        buf, _, it = state
        nb = jnp.where(is_m, buf[srch], buf[HALO:])
        nbuf = buf.at[HALO:].set(nb)
        changed = jnp.sum((nb != buf[HALO:]).astype(jnp.int32))
        return nbuf, changed, it + 1

    def cond(state):
        _, changed, it = state
        return (changed > 0) & (it < out_cap)

    buf, _, it = jax.lax.while_loop(
        cond, body, (buf, jnp.int32(1), jnp.int32(0)))
    return buf[HALO:].astype(jnp.uint8)


def expand_tokens_ref(tok_lm, outlen, halo, out_cap: int):
    """Full-pipeline referee (any backend). Same contract as
    expand2.expand_tokens: returns (out (out_cap,) u8, produced)."""
    off, seed = slot_attrs(tok_lm, outlen)
    produced = jnp.sum(outlen)
    S = seed_scatter_ref(off, seed, out_cap)
    P = propagate(S)
    out = resolve_ref(P, halo, out_cap)
    return out, produced


# ====================== TPU kernels ======================
#
# Kernel 1 (seed): sequential pass over slot rows, grid over 256 KiB output
# regions (seeds are points, so every seed belongs to exactly one region;
# boundary slot rows are visited by both regions with in-region masking).
# Kernel 2 (resolve): grid over 32 KiB output chunks; per 2 KiB step one
# bf16 one-hot matmul gathers all 2048 source bytes from the staged window,
# then fixpoint rounds settle intra-step chains.

REG_OUT = 1 << 18                     # seed-kernel region: output bytes
REG_ROWS = REG_OUT // 128
SEED_CHUNK = 512                      # slot rows DMA'd per fetch
WINP = 256                            # seed scatter window positions

CHUNK_ROWS = 256                      # resolve chunk: 32 KiB output
STEPS_PER_CHUNK = (CHUNK_ROWS * 128) // STEP
STEP_ROWS = STEP // 128               # 16
WR = 288                              # gather window rows (36 KiB + align)
# front zero pad sized so the first step's window starts exactly at row 0:
# stage = [pad | halo | output]; window = WR-STEP_ROWS rows before the step
HALO_ROWS = HALO // 128
PADF_ROWS = WR - STEP_ROWS - HALO_ROWS   # 16


def _seed_kernel(lr_lo, lr_hi, offs_hbm, seeds_hbm, s_out,
                 stage, offv, seedv, sem_o, sem_s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = pl.program_id(0)
    rbase = r * REG_OUT
    rend = rbase + REG_OUT
    lo = lr_lo[r]
    hi = lr_hi[r]

    stage[:, :] = jnp.zeros(stage.shape, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINP), 1)
    BIG = jnp.int32(1 << 30)

    def fetch(row0a):
        row0 = pl.multiple_of((row0a >> 3) << 3, 8)
        co = pltpu.make_async_copy(
            offs_hbm.at[pl.ds(row0, SEED_CHUNK), :], offv, sem_o)
        co.start()
        cs = pltpu.make_async_copy(
            seeds_hbm.at[pl.ds(row0, SEED_CHUNK), :], seedv, sem_s)
        cs.start()
        co.wait()
        cs.wait()
        return row0

    def row_body(carry):
        i, c0 = carry
        c0 = jax.lax.cond(i - c0 >= SEED_CHUNK, lambda: fetch(i),
                          lambda: c0)
        offw = offv[pl.ds(i - c0, 1), :]
        seedw = seedv[pl.ds(i - c0, 1), :]
        eff = ((seedw & V_VALID) != 0) & (offw >= rbase) & (offw < rend)
        offm = jnp.where(eff, offw, BIG)

        def win_cond(rem):
            return jnp.min(rem) < BIG

        def win_body(rem):
            first = jnp.min(rem)
            wbase = ((first - rbase) >> 7) << 7          # row-aligned
            sel = rem < rbase + wbase + WINP
            orel = jnp.where(sel, rem - rbase - wbase, WINP)
            oc = orel.reshape(128, 1)
            oh = (oc == lane).astype(jnp.bfloat16)       # (128, WINP)
            sc = seedw.reshape(128, 1)
            out = jnp.zeros((1, WINP), jnp.int32)
            for shift in (0, 8, 24):
                plane = ((sc >> shift) & 0xFF).astype(jnp.bfloat16)
                m = jax.lax.dot_general(
                    plane.reshape(1, 128), oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out | (m.astype(jnp.int32) << shift)
            wrow = wbase >> 7
            cur = stage[pl.ds(wrow, WINP // 128), :]
            stage[pl.ds(wrow, WINP // 128), :] = cur | out.reshape(
                WINP // 128, 128)
            return jnp.where(sel, BIG, rem)

        jax.lax.while_loop(win_cond, win_body, offm)
        return i + 1, c0

    def row_cond(carry):
        i, _ = carry
        return i < hi

    jax.lax.while_loop(row_cond, row_body, (lo, fetch(lo)))
    s_out[:, :] = stage[pl.ds(0, REG_ROWS), :]


@functools.partial(jax.jit, static_argnames=("out_cap",))
def seed_scatter_tpu(off_flat, seed_flat, out_cap: int):
    """Place seeds at their output positions: (out_cap//128, 128) i32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = off_flat.shape[0]
    SRn = -(-n // 128)
    SR = -(-SRn // SEED_CHUNK) * SEED_CHUNK + SEED_CHUNK
    offs2d = jnp.full(SR * 128, 1 << 30, jnp.int32).at[:n].set(
        off_flat).reshape(SR, 128)
    seeds2d = jnp.zeros(SR * 128, jnp.int32).at[:n].set(
        seed_flat).reshape(SR, 128)
    nreg = -(-out_cap // REG_OUT)
    # per-region slot-row ranges, with overlap for boundary-spanning rows.
    # row_last must be sorted for searchsorted: rows with no valid seed get
    # the running max via cummax (their -1 would break monotonicity).
    row_first = offs2d[:SRn, 0]
    row_last = jax.lax.cummax(jnp.max(jnp.where(
        (seeds2d[:SRn] & V_VALID) != 0, offs2d[:SRn], -1), axis=1))
    bounds = jnp.arange(nreg + 1, dtype=jnp.int32) * REG_OUT
    lr_lo = jnp.searchsorted(row_last, bounds[:-1]).astype(jnp.int32)
    lr_hi = jnp.searchsorted(row_first, bounds[1:],
                             side="left").astype(jnp.int32)
    lr_hi = jnp.minimum(jnp.maximum(lr_hi, lr_lo), SRn)

    out = pl.pallas_call(
        _seed_kernel,
        grid=(nreg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((REG_ROWS, 128), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nreg * REG_ROWS, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((REG_ROWS + 8, 128), jnp.int32),   # +guard rows
            pltpu.VMEM((SEED_CHUNK, 128), jnp.int32),
            pltpu.VMEM((SEED_CHUNK, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(lr_lo, lr_hi, offs2d, seeds2d)
    return out[: -(-out_cap // 128)]


def _resolve_kernel(halo_ref, p_ref, out_ref, stage, err_ref):
    from jax.experimental import pallas as pl

    c = pl.program_id(0)
    base_row = PADF_ROWS + HALO_ROWS + c * CHUNK_ROWS

    @pl.when(c == 0)
    def _init():
        stage[:, :] = jnp.zeros(stage.shape, jnp.bfloat16)
        stage[pl.ds(PADF_ROWS, HALO_ROWS), :] = halo_ref[:, :].astype(
            jnp.bfloat16)
        err_ref[0, 0] = 0

    lanei = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 0)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    siota = jax.lax.broadcasted_iota(jnp.int32, (1, STEP_ROWS), 1)

    def step(s, err):
        srow = base_row + s * STEP_ROWS
        sbase = (c * CHUNK_ROWS + s * STEP_ROWS) * 128   # batch-rel position
        P = p_ref[pl.ds(s * STEP_ROWS, STEP_ROWS), :]
        pos = sbase + rowi * 128 + lanei
        valid = (P & V_VALID) != 0
        is_lit = valid & ((P & V_LIT) != 0)
        is_m = valid & ~is_lit
        lit = P & 0xFF
        d = (P & 0x7FFF) + 1
        phase = (P >> 15) & 0x1FF
        q = jnp.floor(phase.astype(jnp.float32)
                      / d.astype(jnp.float32)).astype(jnp.int32)
        rr = phase - q * d
        rr = jnp.where(rr < 0, rr + d, rr)
        rr = jnp.where(rr >= d, rr - d, rr)
        src = pos - phase - d + jnp.where(phase < d, phase, rr)
        sidx = src + PADF_ROWS * 128 + HALO               # stage coords
        sidx = jnp.clip(sidx, 0, (srow + STEP_ROWS) * 128 - 1)

        wrow0 = pl.multiple_of(srow - (WR - STEP_ROWS), 8)
        win = stage[pl.ds(wrow0, WR), :]                  # (WR,128) bf16
        srel = jnp.clip((sidx >> 7) - wrow0, 0, WR - 1)
        oh = (srel.reshape(STEP, 1) == wiota).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (STEP,128)
        gi = g.astype(jnp.int32)
        vg = jnp.take_along_axis(gi, (sidx & 127).reshape(STEP, 1),
                                 axis=1).reshape(STEP_ROWS, 128)
        val = jnp.where(is_lit, lit, jnp.where(is_m, vg, 0))
        stage[pl.ds(srow, STEP_ROWS), :] = val.astype(jnp.bfloat16)

        # fixpoint rounds for intra-step chains: gather only from the
        # step's own rows (sources before the step were final in round 1)
        intra = is_m & (src >= sbase)
        srel2 = jnp.clip((sidx >> 7) - srow, 0, STEP_ROWS - 1)

        def r_cond(rc):
            _, changed, it = rc
            return (changed > 0) & (it < MAX_ROUNDS)

        def r_body(rc):
            val, _, it = rc
            win2 = stage[pl.ds(srow, STEP_ROWS), :]
            oh2 = (srel2.reshape(STEP, 1) == siota).astype(jnp.bfloat16)
            g2 = jax.lax.dot_general(
                oh2, win2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v2 = jnp.take_along_axis(
                g2.astype(jnp.int32), (sidx & 127).reshape(STEP, 1),
                axis=1).reshape(STEP_ROWS, 128)
            nval = jnp.where(intra, v2, val)
            ch = jnp.sum((nval != val).astype(jnp.int32))
            stage[pl.ds(srow, STEP_ROWS), :] = nval.astype(jnp.bfloat16)
            return nval, ch, it + 1

        any_intra = jnp.sum(intra.astype(jnp.int32))
        val, _, rounds = jax.lax.while_loop(
            r_cond, r_body, (val, any_intra, jnp.int32(0)))
        return err + (rounds >= MAX_ROUNDS).astype(jnp.int32)

    err = jax.lax.fori_loop(0, STEPS_PER_CHUNK, step, jnp.int32(0))
    err_ref[0, 0] = err_ref[0, 0] + err
    out_ref[:, :] = stage[pl.ds(base_row, CHUNK_ROWS), :].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def resolve_tpu(P2d, halo, out_cap: int):
    """Resolve the plan to output bytes. P2d: (out_cap//128, 128) i32.
    Returns (out (out_cap,) u8, err scalar i32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunk = -(-out_cap // (CHUNK_ROWS * 128))
    rows = nchunk * CHUNK_ROWS
    Pp = jnp.zeros((rows, 128), jnp.int32).at[:P2d.shape[0]].set(P2d)
    halo2d = halo.reshape(HALO_ROWS, 128)
    stage_rows = PADF_ROWS + HALO_ROWS + rows + 8

    out, err = pl.pallas_call(
        _resolve_kernel,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # halo
            pl.BlockSpec((CHUNK_ROWS, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),                 # P
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_ROWS, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((stage_rows, 128), jnp.bfloat16)],
    )(halo2d, Pp)
    return out.reshape(-1)[:out_cap], err[0, 0]


def expand_tokens(tok_lm: jnp.ndarray, outlen: jnp.ndarray,
                  halo: jnp.ndarray, out_cap: int):
    """TPU pipeline. Same contract as expand2.expand_tokens plus an error
    flag: returns (out (out_cap,) u8, produced, err)."""
    off, seed = slot_attrs(tok_lm, outlen)
    produced = jnp.sum(outlen)
    S2d = seed_scatter_tpu(off, seed, out_cap)
    P2d = propagate(S2d.reshape(-1)).reshape(S2d.shape)
    out, err = resolve_tpu(P2d, halo, out_cap)
    return out, produced, err
