"""Wavefront (bit-parallel) DEFLATE decode kernels.

Reference behavior reproduced (never translated): the inflator's two-level
table decode loop (decodefast, src/inflator.c:1529-1823) with packed-u32 table
entries (src/inflator.c:320-333), canonical table construction with the full
validity matrix (buildtable, src/inflator.c:380-568), and back-reference
copies (copybytes, src/inflator.c:1213-1290).

TPU-first design (BASELINE.json north star + SURVEY.md §7): instead of a
serial bit cursor, decode speculatively at EVERY bit position of a block — a
pure gather per position — producing f[p] = p + symbol_bits(p). The true
symbol sequence is the orbit of the block's first symbol bit under f,
extracted in O(log n) pointer-doubling rounds. LZ back-references are resolved
afterwards on the output buffer by dependency doubling. Tables are flat
15-bit-indexed (the two-level scheme collapses; 2^15 u32 entries per tree fit
HBM trivially and index arithmetic stays branch-free).

Entry format (u32):
  bits 0..4   codelen (0 = invalid slot)
  bits 5..7   kind: 0 invalid, 1 literal, 2 length/dist code, 3 end-of-block
  bits 8..11  extra bits
  bits 16..31 payload: literal byte / length base / distance base
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from . import huffman

KIND_INVALID = 0
KIND_LIT = 1
KIND_CODE = 2
KIND_EOB = 3

TABLE_BITS = 15
TABLE_SIZE = 1 << TABLE_BITS


def rev15(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 15-bit reversal (u32 in, u32 out).

    Tables are filled contiguously in MSB-aligned canonical space (the fill
    is a scan there); the stream delivers codes LSB-first, so lookups reverse
    the extracted bits — 6 vector ops instead of a 32k-permutation gather."""
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x >> 1


def build_tables_batch(lengths: jnp.ndarray, kinds: jnp.ndarray,
                       extras: jnp.ndarray, payloads: jnp.ndarray) -> jnp.ndarray:
    """Flat decode tables for a batch of trees at once.

    lengths: (B, n) i32 per-block code lengths; kinds/extras/payloads: (n,)
    shared per-symbol attributes. Returns (B * TABLE_SIZE,) u32 — block b's
    table occupies [b*TABLE_SIZE, (b+1)*TABLE_SIZE). Slots not covered by any
    code decode as invalid (kind 0) — foreign-stream validation relies on
    this (cf. inflator.c:454-474).

    Gather-free fill (TPU: random gathers run ~133M elem/s; scans and tiny
    scatters are orders of magnitude faster): each code's ENTRY value is
    scattered at its MSB-aligned interval start and forward-filled by a
    per-block cummax. A cummax carries the max, not the last value, so each
    scattered word is (start << 16 | entry_half) — interval starts strictly
    ascend in canonical order, making the packed words monotone within a
    block; two passes carry the two entry halves. Coverage (incomplete
    trees) comes from a +1/-1 interval diff + cumsum.
    """
    B, n = lengths.shape
    # np->jnp here (inside the trace) so the tables embed as MLIR constants
    kinds = jnp.asarray(kinds)
    extras = jnp.asarray(extras)
    payloads = jnp.asarray(payloads)
    l = lengths.astype(jnp.int32)
    codes = jax.vmap(lambda x: huffman.canonical_codes(x, C.MAX_CODE_BITS)[0])(l)
    used = l > 0
    start = jnp.where(used, codes << jnp.clip(TABLE_BITS - l, 0, TABLE_BITS),
                      TABLE_SIZE)
    width = jnp.where(used, 1 << jnp.clip(TABLE_BITS - l, 0, TABLE_BITS), 0)
    sym = jnp.arange(n, dtype=jnp.int32)[None, :]
    entry = (l | kinds[sym] << 5
             | extras[sym] << 8 | payloads[sym] << 16).astype(jnp.uint32)
    entry = jnp.where(used, entry, 0)

    NT = B * TABLE_SIZE
    bbase = (jnp.arange(B, dtype=jnp.int32) * TABLE_SIZE)[:, None]
    pos = jnp.where(used, bbase + start, NT).reshape(-1)
    # canonical starts are unique per block unless the tree is oversubscribed;
    # .max keeps that case deterministic (callers validate Kraft sums
    # upstream, cf. inflator.c:456-474). start<<16|half <= 32767<<16|65535
    # = INT32_MAX, so the packed key fits i32 exactly.
    lo16 = (entry & 0xFFFF).astype(jnp.int32)
    hi16 = (entry >> 16).astype(jnp.int32)
    key1 = jnp.where(used, (start << 16) | lo16, 0)
    key2 = jnp.where(used, (start << 16) | hi16, 0)
    pk1 = jnp.zeros(NT, jnp.int32).at[pos].max(key1.reshape(-1), mode="drop")
    pk2 = jnp.zeros(NT, jnp.int32).at[pos].max(key2.reshape(-1), mode="drop")
    pk1 = jax.lax.cummax(pk1.reshape(B, TABLE_SIZE), axis=1).reshape(-1)
    pk2 = jax.lax.cummax(pk2.reshape(B, TABLE_SIZE), axis=1).reshape(-1)
    ent = ((pk1 & 0xFFFF) | ((pk2 & 0xFFFF) << 16)).astype(jnp.uint32)
    # interval coverage: invalid for incomplete trees' holes and empty blocks
    # (stride T+1 so a code ending exactly at TABLE_SIZE stays in its block)
    T1 = TABLE_SIZE + 1
    bbase1 = (jnp.arange(B, dtype=jnp.int32) * T1)[:, None]
    pos1 = jnp.where(used, bbase1 + start, B * T1).reshape(-1)
    end1 = jnp.where(used, bbase1 + start + width, B * T1).reshape(-1)
    dif = jnp.zeros(B * T1, jnp.int32).at[pos1].add(
        jnp.where(used, 1, 0).reshape(-1), mode="drop")
    dif = dif.at[end1].add(jnp.where(used, -1, 0).reshape(-1), mode="drop")
    covered = jnp.cumsum(
        dif.reshape(B, T1), axis=1)[:, :TABLE_SIZE].reshape(-1) > 0
    return jnp.where(covered, ent, jnp.uint32(0))


def litlen_attrs():
    """(kinds, extras, payloads) for the 288-symbol literal/length alphabet."""
    kinds = np.full(288, KIND_LIT, np.int32)
    kinds[C.EOB] = KIND_EOB
    kinds[257:286] = KIND_CODE
    kinds[286:] = KIND_CODE        # reserved; only decodable if present
    extras = np.zeros(288, np.int32)
    payloads = np.arange(288, dtype=np.int32)
    payloads[256:] = 0
    extras[257:286] = C.LENGTH_EXTRA
    payloads[257:286] = C.LENGTH_BASE
    # np arrays (not jnp): safe to capture in traces without a lowering d2h
    return kinds, extras, payloads


def dist_attrs():
    kinds = np.full(32, KIND_CODE, np.int32)
    kinds[30:] = KIND_INVALID      # reserved symbols: present in the fixed
    extras = np.zeros(32, np.int32)  # tree (completeness) but invalid on use
    payloads = np.zeros(32, np.int32)
    extras[:30] = C.DIST_EXTRA
    payloads[:30] = C.DIST_BASE
    return kinds, extras, payloads


def extract_bits(words: jnp.ndarray, p: jnp.ndarray, n) -> jnp.ndarray:
    """n-bit LSB-first field at absolute bit position p (n <= 25 guaranteed
    correct via two-word window; shifts all uint32)."""
    pw = (p >> 5).astype(jnp.int32)
    s = (p & 31).astype(jnp.uint32)
    w0 = words[pw]
    w1 = words[pw + 1]
    lo = (w0 >> s) | jnp.where(s == 0, 0, w1 << (jnp.uint32(32) - s))
    if isinstance(n, int):
        return lo & jnp.uint32((1 << n) - 1)
    return lo & ((jnp.uint32(1) << n.astype(jnp.uint32)) - 1)


def _fld(lo: jnp.ndarray, hi: jnp.ndarray, o: jnp.ndarray, n) -> jnp.ndarray:
    """n-bit LSB-first field at offset o (< 49) of a 64-bit window (lo, hi)."""
    o = o.astype(jnp.uint32)
    lo32 = jnp.where(o < 32,
                     (lo >> jnp.minimum(o, 31))
                     | jnp.where(o == 0, 0, hi << (jnp.uint32(32) - o)),
                     hi >> jnp.minimum(o - 32, 31))
    if isinstance(n, int):
        return lo32 & jnp.uint32((1 << n) - 1)
    return lo32 & ((jnp.uint32(1) << n.astype(jnp.uint32)) - 1)


def f_eval(words: jnp.ndarray, ltab: jnp.ndarray, dtab: jnp.ndarray,
           tb: jnp.ndarray, p: jnp.ndarray):
    """Decode ONE symbol at arbitrary bit positions p (any shape).

    tb: table base offsets (bid * TABLE_SIZE), same shape as p.
    Returns (nxt_bits_abs, outlen, lit, dist, invalid) — the symbol-step
    function of the wavefront design, evaluated on demand (the dense
    per-bit array is never materialized; random access is scarce on TPU).

    Gather budget is the whole cost on TPU (~130M random elems/s): one
    3-word window read covers the worst-case 48 bits a symbol consumes
    (15+5+15+13), so a step costs 5 gathers (3 words + 2 table entries)
    instead of 8 with per-field word reads.
    """
    pw = (p >> 5).astype(jnp.int32)
    s = (p & 31).astype(jnp.uint32)
    w0 = words[pw]
    w1 = words[pw + 1]
    w2 = words[pw + 2]
    ns = jnp.uint32(32) - s
    lo = (w0 >> s) | jnp.where(s == 0, 0, w1 << ns)
    hi = (w1 >> s) | jnp.where(s == 0, 0, w2 << ns)

    e1 = ltab[tb + rev15(lo & jnp.uint32(TABLE_SIZE - 1)).astype(jnp.int32)]
    c1 = (e1 & 31).astype(jnp.int32)
    k1 = ((e1 >> 5) & 7).astype(jnp.int32)
    ex1 = ((e1 >> 8) & 15).astype(jnp.int32)
    pay1 = (e1 >> 16).astype(jnp.int32)

    is_lit = k1 == KIND_LIT
    is_eob = k1 == KIND_EOB
    is_len = k1 == KIND_CODE
    invalid = k1 == KIND_INVALID

    lext = _fld(lo, hi, c1, ex1).astype(jnp.int32)
    length = pay1 + lext
    o2 = c1 + ex1
    e2 = dtab[tb + rev15(_fld(lo, hi, o2, TABLE_BITS)).astype(jnp.int32)]
    c2 = (e2 & 31).astype(jnp.int32)
    k2 = ((e2 >> 5) & 7).astype(jnp.int32)
    ex2 = ((e2 >> 8) & 15).astype(jnp.int32)
    pay2 = (e2 >> 16).astype(jnp.int32)
    dext = _fld(lo, hi, o2 + c2, ex2).astype(jnp.int32)
    dist = pay2 + dext
    invalid = invalid | (is_len & (k2 != KIND_CODE))

    nxt = jnp.where(is_len, p + o2 + c2 + ex2, p + c1)
    outlen = jnp.where(is_lit, 1, jnp.where(is_len, length, 0))
    lit = jnp.where(is_lit, pay1, 0)
    dist = jnp.where(is_len, dist, 0)
    return nxt, outlen, lit, dist, invalid, is_eob


def wavefront_decode(words: jnp.ndarray, bit_lo: jnp.ndarray, nbits: int,
                     bid: jnp.ndarray, ltab: jnp.ndarray, dtab: jnp.ndarray):
    """Speculative decode at every bit position in [bit_lo, bit_lo + nbits).

    words: (W,) u32 whole-stream words (+1 pad word).
    bid: (nbits,) i32 block id per position (tables are per block).
    ltab/dtab: (B * 32768,) u32 flat per-block tables.

    Returns (f_local, outlen, lit, dist, flags): each (nbits + 1,) with an
    absorbing sentinel at index nbits. f_local is the next symbol position in
    local coords; EOB maps to the sentinel. flags bit0 = invalid entry.
    """
    p = bit_lo + jnp.arange(nbits, dtype=jnp.int32)
    tb = bid * TABLE_SIZE
    e1 = ltab[tb + rev15(extract_bits(words, p, TABLE_BITS)).astype(jnp.int32)]
    c1 = (e1 & 31).astype(jnp.int32)
    k1 = ((e1 >> 5) & 7).astype(jnp.int32)
    ex1 = ((e1 >> 8) & 15).astype(jnp.int32)
    pay1 = (e1 >> 16).astype(jnp.int32)

    # literal / EOB path
    is_lit = k1 == KIND_LIT
    is_eob = k1 == KIND_EOB
    is_len = k1 == KIND_CODE
    invalid = k1 == KIND_INVALID

    # length + extra, then distance code + extra
    p_ext = p + c1
    lext = extract_bits(words, p_ext, ex1).astype(jnp.int32)
    length = pay1 + lext
    p2 = p_ext + ex1
    e2 = dtab[tb + rev15(extract_bits(words, p2, TABLE_BITS)).astype(jnp.int32)]
    c2 = (e2 & 31).astype(jnp.int32)
    k2 = ((e2 >> 5) & 7).astype(jnp.int32)
    ex2 = ((e2 >> 8) & 15).astype(jnp.int32)
    pay2 = (e2 >> 16).astype(jnp.int32)
    dext = extract_bits(words, p2 + c2, ex2).astype(jnp.int32)
    dist = pay2 + dext
    invalid = invalid | (is_len & (k2 != KIND_CODE))

    f_abs = jnp.where(is_len, p2 + c2 + ex2, p + c1)
    f_local = jnp.where(is_eob | invalid, nbits, f_abs - bit_lo)
    f_local = jnp.clip(f_local, 0, nbits)

    outlen = jnp.where(is_lit, 1, jnp.where(is_len, length, 0))
    lit = jnp.where(is_lit, pay1, 0)
    dist = jnp.where(is_len, dist, 0)
    flags = invalid.astype(jnp.int32)

    sent = lambda x, v: jnp.concatenate([x, jnp.full((1,), v, x.dtype)])
    return (sent(f_local, nbits), sent(outlen, 0), sent(lit, 0),
            sent(dist, 0), sent(flags, 0),
            sent(is_eob.astype(jnp.int32), 0))


def segmented_orbits(f: jnp.ndarray, eobf: jnp.ndarray,
                     sym_starts: jnp.ndarray,
                     block_ends: jnp.ndarray, nbits: int,
                     nseg: int, seg_bits: int, fix_iters: int = 3):
    """Exact symbol-position extraction by strided speculation with lookback.

    Replaces dense pointer-doubling (log2(nbits) full-array gather rounds —
    the decode-side whale) with walks over a per-block segment grid:

      A-pass: for segment m, walk f speculatively from the PREVIOUS segment's
        start — one segment of lookback gives the walk a full segment to
        self-synchronize with the true symbol lattice before its recording
        window begins (sync failures decay exponentially with lookback, cf.
        the rapidgzip speculation argument). Positions inside the window are
        recorded into a bitmap; the first position at/after the window end is
        the speculative exit.
      Stitch: segment m+1's true entry is segment m's exit — assumed from the
        A-exits (exact for segments 0 and 1 by construction) and verified by
        D-walks, iterated to a fixpoint; mispredicted stretches repair one
        lane per iteration from their left edge, so the error flag trips only
        on rare long stretches (caller falls back to the dense orbit).
      D-pass: walk from each entry; the merge point q is the first position
        present in the bitmap (positions are per-segment unique, so bitmap
        membership IS the own-segment check). True symbol positions are
        D-steps before q plus A-window records from q on; if no merge, the
        D-walk alone covers the segment and its exit is exact anyway.

    f: (nbits+1,) absorbing next-symbol-bit map; eobf marks true end-of-block
    symbols (a sentinel jump without EOB means the walk decoded garbage —
    only speculative walks can do that; such exits are flagged BROKEN, never
    trusted). Each block's grid is clamped to its own bit span, so recorded
    positions are globally unique.

    Returns (positions (B*nseg*(2*seg_bits+1),) i32 in stream order with
    sentinel nbits for inactive slots, err i32).
    """
    B = sym_starts.shape[0]
    S = seg_bits
    m = jnp.tile(jnp.arange(nseg, dtype=jnp.int32), B)
    sb = jnp.repeat(sym_starts, nseg)
    eb = jnp.repeat(jnp.minimum(block_ends, nbits), nseg)
    seg_start = jnp.minimum(sb + m * S, eb)
    seg_end = jnp.minimum(seg_start + S, eb)
    lanes = B * nseg
    big = jnp.int32(nbits + 8)
    DEAD = jnp.int32(nbits)          # true end-of-chain (EOB reached)
    BROKEN = jnp.int32(nbits + 1)    # speculative walk hit an invalid slot

    def walk(p0, steps, bitmap):
        """Walk f for `steps`; record positions in [seg_start, seg_end);
        exit = first position >= seg_end (DEAD/BROKEN for sentinel jumps)."""
        def step(carry, _):
            p, exit_p, q = carry
            exited = exit_p < big
            at_end = p >= seg_end
            newly = ~exited & at_end
            exit_p = jnp.where(newly, jnp.minimum(p, BROKEN), exit_p)
            walking = ~exited & ~at_end
            inwin = walking & (p >= seg_start)
            rec = jnp.where(inwin, p, nbits)
            if bitmap is not None:
                wq = bitmap[jnp.minimum(p >> 5, (nbits >> 5) + 1)]
                hit = inwin & (((wq >> (p.astype(jnp.uint32) & 31)) & 1) == 1)
                q = jnp.where((q >= big) & hit, p, q)
            fp = f[jnp.minimum(p, nbits)]
            ended = walking & (fp >= nbits)
            fp = jnp.where(ended & (eobf[jnp.minimum(p, nbits)] > 0),
                           DEAD, jnp.where(ended, BROKEN, fp))
            pn = jnp.where(walking, fp, p)
            return (pn, exit_p, q), rec

        init = (p0, jnp.full_like(p0, big), jnp.full_like(p0, big))
        (pf, exit_p, q), recs = jax.lax.scan(step, init, None, length=steps)
        exit_p = jnp.where(exit_p >= big, jnp.minimum(pf, BROKEN), exit_p)
        return recs, exit_p, q

    # A-pass with one segment of lookback (clamped at the block's sym start)
    p0a = jnp.maximum(seg_start - S, jnp.minimum(sb, seg_start))
    a_recs, a_exit, _ = walk(p0a, 2 * S, None)
    # compress the 2S-step records into S+1 window slots
    inwin = a_recs < nbits
    slot = jnp.cumsum(inwin.astype(jnp.int32), axis=0) - inwin
    lane_idx = jnp.broadcast_to(
        jnp.arange(lanes, dtype=jnp.int32)[None, :], a_recs.shape)
    flatidx = (lane_idx * (S + 1) + jnp.minimum(slot, S)).reshape(-1)
    a_pos = jnp.full(lanes * (S + 1), nbits, jnp.int32).at[flatidx].min(
        a_recs.reshape(-1)).reshape(lanes, S + 1)

    # visited bitmap: positions are unique across all walks, so add == or
    flat = a_recs.reshape(-1)
    bw = (nbits >> 5) + 2
    bitmap = jnp.zeros(bw, jnp.uint32).at[
        jnp.minimum(flat >> 5, bw - 1)].add(
        jnp.where(flat < nbits,
                  jnp.uint32(1) << (flat.astype(jnp.uint32) & 31), 0),
        mode="drop")

    # lanes whose clamped segment is empty never hold symbols; pin them
    degenerate = seg_start >= seg_end

    def entries_from(exits):
        e = jnp.where(degenerate, DEAD, exits).reshape(B, nseg)
        ent = jnp.concatenate([sym_starts[:, None], e[:, :-1]], 1).reshape(-1)
        return jnp.where(degenerate, DEAD, ent)

    entry = entries_from(a_exit)
    err = jnp.int32(0)
    d_recs = a_recs[:S]
    q = jnp.full_like(entry, big)
    for it in range(fix_iters):
        d_recs, d_exit, q = walk(entry, S, bitmap)
        merged = q < big
        exit_sel = jnp.where(merged, a_exit, d_exit)
        new_entry = entries_from(exit_sel)
        live = ~degenerate
        changed = jnp.sum(((new_entry != entry) & live).astype(jnp.int32))
        if it == fix_iters - 1:
            # unconverged or still-broken entries -> caller falls back
            err = changed + jnp.sum(
                ((new_entry == nbits + 1) & live).astype(jnp.int32))
        entry = new_entry

    d_slots = jnp.where(d_recs < q[None, :], d_recs, nbits)      # (S, lanes)
    a_slots = jnp.where(a_pos >= q[:, None], a_pos, nbits)       # (lanes, S+1)
    slots = jnp.concatenate([d_slots.T, a_slots], axis=1)
    return slots.reshape(-1), err


ANCHOR_STRIDE = 64   # encoder emits every 64th symbol's bit offset


def anchored_walk(words: jnp.ndarray, ltab: jnp.ndarray, dtab: jnp.ndarray,
                  tb: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray,
                  steps: int = ANCHOR_STRIDE):
    """Exact decode walks between known symbol anchors (no speculation).

    Our encoder records every 64th symbol's bit position in the stream index
    (the bitpack scan knows every offset for free), so decode entry points
    are exact: each lane walks `steps` symbols on demand via f_eval. A lane
    finishes by landing exactly on its end anchor or by decoding the block's
    EOB; anything else (overshoot, invalid entry, unfinished) raises err.

    starts/ends/tb: (L,) i32 — local bit positions and per-lane table bases;
    padding lanes use starts >= ends with ends <= 0 ... any lane with
    starts < 0 is inactive.

    Returns (outlen, lit, dist: (L, steps) i32 slot arrays, err i32).
    """
    active0 = starts >= 0

    def step(carry, _):
        p, done, err = carry
        active = ~done
        nxt, outlen, lit, dist, invalid, is_eob = f_eval(
            words, ltab, dtab, tb, jnp.maximum(p, 0))
        outlen = jnp.where(active, outlen, 0)
        lit = jnp.where(active, lit, 0)
        dist = jnp.where(active, dist, 0)
        err = err | (active & invalid)
        overshoot = active & ~is_eob & (nxt > ends)
        err = err | overshoot
        done_now = active & (is_eob | (nxt >= ends))
        p = jnp.where(active, nxt, p)
        return (p, done | done_now, err), (outlen, lit, dist)

    init = (starts, ~active0, jnp.zeros_like(active0))
    (pf, done, errs), (outlen, lit, dist) = jax.lax.scan(
        step, init, None, length=steps)
    err = jnp.sum(errs.astype(jnp.int32)) + jnp.sum((~done).astype(jnp.int32))
    return outlen.T, lit.T, dist.T, err


def orbits(f_local: jnp.ndarray, starts: jnp.ndarray, max_syms: int) -> jnp.ndarray:
    """P[b, m] = f^m(starts[b]) for all blocks at once (pointer doubling).

    f_local: (nbits + 1,) with absorbing sentinel at nbits.
    starts: (B,) i32 local bit positions of each block's first symbol.
    """
    p = starts[:, None].astype(jnp.int32)
    j = f_local.astype(jnp.int32)
    while p.shape[1] < max_syms:
        p = jnp.concatenate([p, j[p]], axis=1)
        if p.shape[1] < max_syms:
            j = j[j]
    return p[:, :max_syms]


def lz_resolve(val: jnp.ndarray, src: jnp.ndarray, resolved: jnp.ndarray,
               mask: jnp.ndarray, max_rounds: int):
    """Resolve back-reference chains by pointer doubling, stopping as soon as
    every masked position is resolved (chains are usually much shorter than
    the worst case, so the adaptive loop saves most rounds).

    val: (N,) i32 output bytes (literal positions already set).
    src: (N,) i32 copy-source index per position (self for resolved).
    resolved: (N,) bool. mask: (N,) bool — positions that must resolve.

    val and resolved travel packed in one word (byte | done<<8): each round
    costs two N-gathers instead of three (gathers are the decode whale at
    ~133M elem/s on v5e).
    """
    pv = (val & 0xFF) | (resolved.astype(jnp.int32) << 8)

    def cond(c):
        pv, _, i = c
        return (i < max_rounds) & jnp.any((pv < 256) & mask)

    def body(c):
        pv, src, i = c
        done = pv >= 256
        s = pv[src]
        pv = jnp.where(done, pv, s)
        src = jnp.where(done, src, src[src])
        return (pv, src, i + 1)

    pv, src, _ = jax.lax.while_loop(cond, body, (pv, src, jnp.int32(0)))
    return pv & 0xFF, pv >= 256
