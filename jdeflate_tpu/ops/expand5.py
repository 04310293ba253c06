"""Token-expansion engine v5: per-position plan + MXU windowed-gather resolve.

Replaces the serial in-VMEM walk of ops/expand2.py (v3, ~135 ns/token —
serial control is what a TPU is worst at) with a mostly-parallel pipeline:

  1. slot attrs (XLA): per-slot output offset (cumsum) + 16-bit seed
     (literal byte / match distance) over the (L, S_SLICE) fast slice;
     rare lanes with more tokens ride the exact top-k spill pass.
  2. seed kernel (Pallas): scatter-matmul — each SREG-byte region's
     candidate slots are placed by row/lane one-hots contracted on the
     MXU; no sequential scan, no XLA scatter.
  3. butterfly propagate (XLA): every output position learns its covering
     token's pack and its phase within it, in 9 shift/select stages
     (a DEFLATE item is at most 258 bytes — RFC 1951; cf. MAXMATCH,
     /root/reference/src/deflator.c:21-45 — so 9 doubling steps suffice).
  4. resolve kernel (Pallas): sequential 2 KiB steps over the output.
     Intra-step chains ground by POINTER DOUBLING on the collapsed-source
     map (log2 rounds, value-free); then ONE one-hot bf16 matmul gathers
     every position's byte from the last-36 KiB window in VMEM (exact:
     bytes <= 255 are exact in bf16). The reference handles the same
     chains byte-serially in its overlapped-copy loop,
     /root/reference/src/inflator.c:1747-1753.

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
STEP = 2048        # resolve step bytes (16 output rows)
V_VALID = np.int32(1 << 25)
V_LIT = np.int32(1 << 24)
DBL_ROUNDS = (STEP - 1).bit_length()   # pointer-doubling cap: chains are at
#   most STEP deep inside a step, so log2(STEP) doublings always ground


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
# Kernel 1 (seed): grid over SREG-byte output regions; each region's seeds
# are placed by a scatter-matmul — candidates' row/lane one-hots contracted
# on the MXU (no sequential scan, no XLA scatter). Candidate slots arrive
# as two scalar-prefetched CANDW-wide logical rows.
# Kernel 2 (resolve): grid over 32 KiB output chunks; per 2 KiB step,
# pointer doubling grounds intra-step chains, then one bf16 one-hot matmul
# gathers every position's byte from the staged window.

S_SLICE = 8        # slots per lane consumed by the seed fast path; lanes
#                    with more tokens ride the exact spill pass
SREG = 4096                           # seed region output bytes
SREG_ROWS = SREG // 128               # 32
CANDW = 8192   # candidate slots per prefetch block. Worst realistic slot
#   density is ~2 slots/output byte (literal-only lanes emit ~4 bytes per
#   32-bit window = 4-5 of their 8 slots), so a 4096-byte region spans up
#   to ~8500 slots incl. entry-padding lanes; the two-block window (2x
#   CANDW) covers it. Pathological codes (15-bit literals) can exceed it
#   -> err -> native fallback.

CHUNK_ROWS = 256                      # resolve chunk: 32 KiB output
STEPS_PER_CHUNK = (CHUNK_ROWS * 128) // STEP
STEP_ROWS = STEP // 128               # 16
WR = 288                              # gather window rows (36 KiB + align)
# front zero pad sized so the first step's window starts exactly at row 0:
# stage = [pad | halo | output]; window = WR-STEP_ROWS rows before the step
HALO_ROWS = HALO // 128
PADF_ROWS = WR - STEP_ROWS - HALO_ROWS   # 16
def _seed_mm_kernel(lo_b, offA, offB, seedA, seedB, s_out):
    """Scatter-matmul seed placement for one SREG-byte output region.

    Candidate slots: the flat slot arrays are viewed as (NB, CANDW) logical
    blocks; Mosaic block specs need 8-row granularity, so two (8, CANDW)
    blocks arrive and the region's two logical rows are picked with cheap
    dynamic single-row reads. All operands are then plain 2D broadcasts —
    no 3D one-hots, no transposed contractions:
      Rm (SREG_ROWS, CANDW) row one-hot   = broadcast compare
      Wl (CANDW, 128)       lane one-hot * seed plane ((1,N)->(N,1) is the
                            supported reshape direction)
      S  = Rm @ Wl  per byte plane (exact: planes <= 255 in bf16)
    """
    from jax.experimental import pallas as pl

    r = pl.program_id(0)
    rbase = r * SREG
    rend = rbase + SREG
    riota = jax.lax.broadcasted_iota(jnp.int32, (SREG_ROWS, 1), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    j0 = lo_b[r] & 7

    def pick(refA, refB, j):
        a = refA[pl.ds(jnp.minimum(j, 7), 1), :]
        b = refB[pl.ds(jnp.maximum(j - 8, 0), 1), :]
        return jnp.where(j < 8, a, b)                      # (1, CANDW)

    def contrib(offw, seedw):
        eff = (seedw != 0) & (offw >= rbase) & (offw < rend)   # (1, CANDW)
        orel = jnp.where(eff, offw - rbase, SREG)
        Rm = jnp.where((orel >> 7) == riota, 1, 0).astype(
            jnp.bfloat16)                                  # (ROWS, CANDW)
        oc = orel.reshape(CANDW, 1)
        sc = seedw.reshape(CANDW, 1)
        ohl = (oc & 127) == liota                          # (CANDW, 128)
        planes = []
        for shift in (0, 8):
            pv = (sc >> shift) & 0xFF
            Wl = jnp.where(ohl, pv, 0).astype(jnp.bfloat16)
            m = jax.lax.dot_general(
                Rm, Wl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (ROWS, 128)
            planes.append(m.astype(jnp.int32))
        return planes[0], planes[1]

    loA, hiA = contrib(pick(offA, offB, j0), pick(seedA, seedB, j0))
    loB, hiB = contrib(pick(offA, offB, j0 + 1), pick(seedA, seedB, j0 + 1))
    s_out[:, :] = ((hiA + hiB) << 8) | (loA + loB)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def seed_scatter_mm(off_flat, seed16_flat, out_cap: int):
    """Place 16-bit seeds at their output positions via the scatter-matmul
    kernel. Returns ((out_cap//128, 128) i32 seed16-at-position, err) where
    err counts regions whose candidate slot range exceeded the two-row
    window (caller falls back)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = off_flat.shape[0]
    NB = (-(-(-(-n // CANDW)) // 8) + 2) * 8     # blocks, padded + guard
    offs2d = jnp.full(NB * CANDW, 1 << 30, jnp.int32).at[:n].set(
        off_flat).reshape(NB, CANDW)
    seeds2d = jnp.zeros(NB * CANDW, jnp.int32).at[:n].set(
        seed16_flat).reshape(NB, CANDW)
    nreg = -(-out_cap // SREG)

    # blk_last[b] = last VALID seed off at-or-before block b (cummax):
    # valid offs are strictly increasing in flat order, so the first block
    # with blk_last >= x holds the last seed < x; empty slots never extend
    # a range (they inherit offs but carry seed 0)
    blk_last = jax.lax.cummax(jnp.max(jnp.where(
        seeds2d != 0, offs2d, -1), axis=1))
    bounds = jnp.arange(nreg + 1, dtype=jnp.int32) * SREG
    # block index of the final valid seed: regions past the produced data
    # (or past the last seed < rend) must not extend to the padding blocks
    last_blk = jnp.searchsorted(blk_last, blk_last[-1],
                                side="left").astype(jnp.int32)
    lo_b = jnp.searchsorted(blk_last, bounds[:-1]).astype(jnp.int32)
    hi_b = jnp.minimum(jnp.searchsorted(
        blk_last, bounds[1:], side="left").astype(jnp.int32), last_blk) + 1
    err = jnp.sum((hi_b > lo_b + 2).astype(jnp.int32))
    lo_b = jnp.minimum(lo_b, NB - 16)    # both 8-row blocks stay in bounds

    out = pl.pallas_call(
        _seed_mm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nreg,),
            in_specs=[
                pl.BlockSpec((8, CANDW), lambda r, lo_b: (lo_b[r] // 8, 0)),
                pl.BlockSpec((8, CANDW),
                             lambda r, lo_b: (lo_b[r] // 8 + 1, 0)),
                pl.BlockSpec((8, CANDW), lambda r, lo_b: (lo_b[r] // 8, 0)),
                pl.BlockSpec((8, CANDW),
                             lambda r, lo_b: (lo_b[r] // 8 + 1, 0)),
            ],
            out_specs=pl.BlockSpec((SREG_ROWS, 128), lambda r, lo_b: (r, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nreg * SREG_ROWS, 128), jnp.int32),
    )(lo_b, offs2d, offs2d, seeds2d, seeds2d)
    return out[: -(-out_cap // 128)], err


def _tok_attrs(toks: jnp.ndarray, laneoff: jnp.ndarray):
    """Token rows + per-lane output offsets -> (off, seed16) arrays.

    seed16: 0 empty; 0x8000|byte literal; d in 1..32767 match (d=32768 ->
    0xFFFF)."""
    kind = (toks >> 30).astype(jnp.int32)
    is_lit = kind == wk.TOK_LIT
    is_m = kind == wk.TOK_MATCH
    ln = jnp.where(is_lit, 1,
                   jnp.where(is_m, (toks & 0x1FF).astype(jnp.int32), 0))
    within = jnp.cumsum(ln, axis=1) - ln
    off = laneoff[:, None] + within
    d = ((toks >> 9) & 0x7FFF).astype(jnp.int32) + 1
    lit = (toks & 0xFF).astype(jnp.int32)
    seed16 = jnp.where(
        is_lit, 0x8000 | lit,
        jnp.where(is_m, jnp.where(d == 32768, 0xFFFF, d), 0))
    return off, seed16


SPILL_K = 128      # spill lanes handled exactly per batch; more -> err


def slot_attrs16(tok_lm: jnp.ndarray, outlen: jnp.ndarray):
    """(L, S) walk tokens -> (off, seed16) over the (L, S_SLICE) fast
    slice, for the scatter-matmul seed kernel."""
    laneoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])[:-1]
    off, seed16 = _tok_attrs(tok_lm[:, :S_SLICE], laneoff)
    return off.reshape(-1), seed16.reshape(-1)


def spill_pass(tok_lm, outlen, S16_flat, out_cap: int):
    """Seed the rare lanes with more than S_SLICE tokens (dense literal
    runs: short litlen codes pack >8 symbols into one 32-bit window).
    Gathers the top-SPILL_K spill lanes and scatters their beyond-slice
    seeds directly (a few thousand elements — XLA scatter is fine at this
    size). err if more than SPILL_K lanes spilled."""
    L = tok_lm.shape[0]
    kind_all = (tok_lm >> 30).astype(jnp.int32)
    has_spill = jnp.any(kind_all[:, S_SLICE:] != 0, axis=1)
    n_spill = jnp.sum(has_spill.astype(jnp.int32))
    score = jnp.where(has_spill, jnp.arange(L, dtype=jnp.int32), -1)
    vals, idxs = jax.lax.top_k(score, min(SPILL_K, L))
    laneoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])[:-1]
    rows = jnp.take(tok_lm, idxs, axis=0)
    offr, seedr = _tok_attrs(rows, jnp.take(laneoff, idxs))
    sel = (seedr != 0) & (vals[:, None] >= 0)
    sel = sel.at[:, :S_SLICE].set(False)       # fast slice already seeded
    tgt = jnp.where(sel & (offr < out_cap), offr, out_cap)
    S16_flat = jnp.concatenate(
        [S16_flat, jnp.zeros(1, S16_flat.dtype)]).at[
        tgt.reshape(-1)].max(seedr.reshape(-1), mode="drop")[:out_cap]
    err = jnp.where(n_spill > SPILL_K, n_spill, 0)
    return S16_flat, err


def seed16_to_plan(S16: jnp.ndarray) -> jnp.ndarray:
    """Positioned 16-bit seeds -> plan packs (V_VALID/V_LIT/payload)."""
    v = S16 & 0xFFFF
    valid = v != 0
    is_lit = (v >= 0x8000) & (v <= 0x80FF)
    dm1 = jnp.where(v == 0xFFFF, 32767, v - 1)
    pay = jnp.where(is_lit, v & 0xFF, dm1 & 0x7FFF)
    return jnp.where(
        valid, V_VALID | jnp.where(is_lit, V_LIT, 0) | pay, 0)


def _resolve_kernel(halo_ref, p_ref, out_ref, err_ref, stage):
    from jax.experimental import pallas as pl

    c = pl.program_id(0)
    base_row = PADF_ROWS + HALO_ROWS + c * CHUNK_ROWS

    @pl.when(c == 0)
    def _init():
        stage[:, :] = jnp.zeros(stage.shape, jnp.bfloat16)
        # Mosaic has no u8<->bf16 cast; bounce through i32
        stage[pl.ds(PADF_ROWS, HALO_ROWS), :] = halo_ref[:, :].astype(
            jnp.int32).astype(jnp.bfloat16)
        err_ref[0, 0] = 0

    lanei = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 0)
    wiota3 = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128, WR), 2)
    siota3 = jax.lax.broadcasted_iota(
        jnp.int32, (STEP_ROWS, 128, STEP_ROWS), 2)
    giota3 = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128, 128), 2)

    # Mosaic supports reshapes that merge/split LEADING dims only (the
    # minor dim must survive), so per-position one-hots are built in 3D
    # (rows, lanes, targets) and flattened to (STEP, targets) for the MXU.
    def row_onehot(srel, width, iota3):
        """srel (STEP_ROWS,128) -> (STEP, width) bf16 one-hot."""
        oh3 = jnp.where(srel[:, :, None] == iota3, 1, 0).astype(jnp.bfloat16)
        return oh3.reshape(STEP, width)

    def lane_select(g, lane_idx):
        """g (STEP,128) i32 position-major gather rows, lane_idx
        (STEP_ROWS,128) -> (STEP_ROWS,128): pick g[p, lane_idx[p]] per
        position (no 2D take_along_axis in Mosaic; one-hot multiply +
        minor-axis sum rides the VPU)."""
        g3 = g.reshape(STEP_ROWS, 128, 128)
        return jnp.sum(jnp.where(lane_idx[:, :, None] == giota3, g3, 0),
                       axis=2)

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

        # literal pre-write: intra-step chains ground on literal values
        stage[pl.ds(srow, STEP_ROWS), :] = jnp.where(
            is_lit, lit, 0).astype(jnp.bfloat16)

        # pointer doubling on the collapsed-source map: cur[p] jumps 2^k
        # chain hops per round, so any intra-step chain (depth <= STEP)
        # grounds in <= log2(STEP) rounds — no value iteration, no
        # data-dependent round count beyond the early-exit check. A ground
        # pointer is pre-step (value final in stage) or an intra literal
        # (value just written); literals/invalid point at themselves, so
        # gathered pointers stabilize exactly at ground.
        OFF0 = sbase - (WR - STEP_ROWS) * 128            # window start
        cur0 = jnp.where(is_m, jnp.maximum(src, OFF0), pos)

        def d_cond(carry):
            _, changed, it = carry
            return (changed > 0) & (it < DBL_ROUNDS)

        def d_body(carry):
            cur, _, it = carry
            qrel = cur - sbase
            intra = qrel >= 0
            qrow = jnp.clip(qrel, 0, STEP - 1) >> 7
            oh = row_onehot(qrow, STEP_ROWS, siota3)
            coff = cur - OFF0                            # in [0, WR*128)
            plo = (coff & 0xFF).astype(jnp.bfloat16)
            phi = (coff >> 8).astype(jnp.bfloat16)
            glo = jax.lax.dot_general(
                oh, plo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ghi = jax.lax.dot_general(
                oh, phi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # one fused lane-select: 256*hi + lo <= 65535 is exact in f32
            vv = lane_select((ghi * 256.0 + glo).astype(jnp.int32),
                             qrel & 127)
            ncur = jnp.where(intra, vv + OFF0, cur)
            ch = jnp.sum((ncur != cur).astype(jnp.int32))
            return ncur, ch, it + 1

        any_intra = jnp.sum((is_m & (src >= sbase)).astype(jnp.int32))
        cur, _, _ = jax.lax.while_loop(
            d_cond, d_body, (cur0, any_intra, jnp.int32(0)))

        # one value gather grounds every position (window includes this
        # step's rows, whose literal values are already in place)
        sidx = jnp.clip(cur + PADF_ROWS * 128 + HALO, 0,
                        (srow + STEP_ROWS) * 128 - 1)
        wrow0 = pl.multiple_of(srow - (WR - STEP_ROWS), 8)
        win = stage[pl.ds(wrow0, WR), :]                  # (WR,128) bf16
        srel = jnp.clip((sidx >> 7) - wrow0, 0, WR - 1)
        oh = row_onehot(srel, WR, wiota3)
        g = jax.lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (STEP,128)
        vg = lane_select(g.astype(jnp.int32), sidx & 127)
        val = jnp.where(is_lit, lit, jnp.where(is_m, vg, 0))
        stage[pl.ds(srow, STEP_ROWS), :] = val.astype(jnp.bfloat16)
        return err

    err = jax.lax.fori_loop(0, STEPS_PER_CHUNK, step, jnp.int32(0))
    err_ref[0, 0] = err_ref[0, 0] + err
    out_ref[:, :] = stage[pl.ds(base_row, CHUNK_ROWS), :].astype(
        jnp.int32).astype(jnp.uint8)


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
    flag (spilled lanes / overflowing seed windows / unconverged chains —
    caller falls back): returns (out (out_cap,) u8, produced, err)."""
    off, seed16 = slot_attrs16(tok_lm, outlen)
    produced = jnp.sum(outlen)
    S16, serr = seed_scatter_mm(off, seed16, out_cap)
    S16f, sperr = spill_pass(tok_lm, outlen, S16.reshape(-1)[:out_cap],
                             out_cap)
    P2d = propagate(seed16_to_plan(S16f)).reshape(-1, 128)
    out, rerr = resolve_tpu(P2d, halo, out_cap)
    return out, produced, serr + sperr + rerr
