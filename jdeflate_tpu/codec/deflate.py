"""Block-parallel DEFLATE encoder: one jitted pipeline over a batch of blocks.

Architecture (TPU-first; see SURVEY.md §7): the unit of work is a batch of
fixed-size blocks with static shapes, not a resumable byte stream. Each batch
runs: parallel hash + sorted-bucket candidate probes -> vectorized match
extension -> local greedy/lazy decision -> pointer-doubling parse orbit ->
per-chunk symbol frequencies -> entropy-guided adaptive block splitting ->
batched Huffman build -> precode RLE -> per-item (value, nbits) -> one global
exclusive scan + scatter-add bitstream pack. Blocks inside a batch are
bit-contiguous, exactly like the reference's multi-block streams; batch seams
are joined with byte-aligned sync-flush blocks (the reference's DEFLT_FLUSH
framing, src/deflator.c:609-654), which double as checkpoint/shard seams
(SURVEY.md §5).

Adaptive splitting: the reference splits blocks when a 32-bucket observation
histogram drifts (shouldsplit, src/deflator.c:2556-2596) — an online decision
in a sequential parser. The batch pipeline sees all frequencies at once, so it
does better: each 64 KiB block is cut into 8 KiB chunks, per-chunk symbol
histograms are prefix-summed, and an exact-entropy dynamic program picks the
cheapest contiguous partition into sub-blocks (entropy of merged histograms +
estimated tree-header cost per group). Every sub-block gets its own Huffman
trees, emitted back-to-back like the reference's split blocks.

Reference parity notes: block-type decision static-vs-dynamic by exact cost
(flushblock, src/deflator.c:1724-1805); dynamic header layout HLIT/HDIST/HCLEN
plus permuted precode lengths plus RLE'd trees (emittrees,
src/deflator.c:1633-1722); RLE symbols 16/17/18 with the leave-3 remainder
adjustment (countprecodes, src/deflator.c:1287-1354).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from ..ops import bitpack, huffman, lz77
from . import levels as levels_mod

HALO = C.WINDOW_SIZE          # per-block history (previous block tail / dict)
PAD = 272                     # match-extension overread guard
RLE_SLOTS = 320               # >= 286+30 worst-case precode RLE symbols
HDR_ITEMS = 2 + 19 + RLE_SLOTS
_SENT = np.int32(19)          # run-breaking sentinel code length (np, not jnp:
# eager device constants captured in traces force a d2h at lowering)

CHUNK = 8192                  # splitter granularity (bytes of input)
# estimated dynamic-header cost used by the split DP: constant part
# (3 + 14 + precode lengths) + per-distinct-symbol RLE cost in bits.
# Tuned by measurement (level 6: 0.978x reference; level 9: 1.0045x).
# Raising the estimate to the measured per-header bit cost merges more
# chunks but measured slightly WORSE at every level: the DP's empirical
# chunk entropies overestimate split gains symmetrically, and the two
# errors roughly cancel at this setting.
_SPLIT_HDR_C0 = np.float32(120.0)
_SPLIT_HDR_C1 = np.float32(5.5)

# Precode RLE extra-bit counts per symbol (16 -> 2, 17 -> 3, 18 -> 7).
_P_EXTRA = np.zeros(19, np.int32)
_P_EXTRA[16:19] = (2, 3, 7)


def _nch(bl: int, chunk: int = CHUNK) -> int:
    """Chunks per block (static). Blocks smaller than 2 chunks never split."""
    return max(bl // chunk, 1)


def anchors_cap(bl: int, chunk: int = CHUNK) -> int:
    """Window-anchor slots per block: one per 32 stream bits at the
    worst-case compressed size (<= ~8.1 bits/byte after the stored-block
    decision, plus per-sub-block header slack)."""
    return (9 * bl + 8192 + _nch(bl, chunk) * 4200) // 32 + 8


def _rle_emit(comb: jnp.ndarray):
    """Per-position precode RLE symbols, computed positionally (no scan).

    Semantics identical to the reference's sequential RLE with the leave-3
    remainder adjustment (countprecodes, src/deflator.c:1287-1354): zero runs
    emit 17 (3-10) / 18 (11-138) with 138-units carved off long runs (a unit
    of m-3 instead when exactly 139/140 remain, leaving a final 3); nonzero
    runs emit the literal then 16-units of 6 (a unit of m-3 when 7/8 remain).
    The unit boundaries of a run are a closed-form function of (value,
    run length, offset), so every position decides independently — the
    sequential skip-scan this replaces cost ~25 ms/MB on device.

    Returns (sym, extra, emit): (n,) each.
    """
    n = comb.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.asarray([-1], jnp.int32), comb[:-1]])
    is_start = comb != prev
    BIG = np.int32(1 << 20)
    startpos = jax.lax.cummax(jnp.where(is_start, idx, -1))
    nxt_start = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([jnp.where(is_start, idx, BIG)[1:],
                         jnp.full((1,), n, jnp.int32)]))))
    r = nxt_start - startpos                   # whole-run length
    q = idx - startpos                         # offset within run
    v = comb
    live = v != _SENT

    # ---- zero runs ----
    # K full 138-units, then m in [3,140]: one unit (m <= 138) or (m-3, 3)
    K = jnp.maximum(0, (r - 3) // 138)
    m = r - 138 * K
    zb1 = 138 * K                              # main tail unit start
    zb2 = zb1 + m - 3                          # 3-left unit (m in 139/140)
    z_small = r < 3                            # literals
    z_at_full = (q < zb1) & (q % 138 == 0)
    z_at_m = q == zb1
    z_at_3 = (m > 138) & (q == zb2)
    z_unit = jnp.where(z_at_full, 138,
                       jnp.where(z_at_m, jnp.where(m > 138, m - 3, m), 3))
    z_emit = z_small | z_at_full | z_at_m | z_at_3
    z_sym = jnp.where(z_small, 0,
                      jnp.where(z_unit <= 10, 17, 18))
    z_extra = jnp.where(z_sym == 17, z_unit - 3,
                        jnp.where(z_sym == 18, z_unit - 11, 0))

    # ---- nonzero runs ----
    m0 = r - 1
    qq = q - 1
    K6 = jnp.maximum(0, (m0 - 3) // 6)
    m6 = m0 - 6 * K6                           # in [3, 8] when m0 >= 3
    nb1 = 6 * K6
    nb2 = nb1 + m6 - 3
    n_small = m0 < 3                           # trailing literals
    n_at_full = (qq >= 0) & (qq < nb1) & (qq % 6 == 0)
    n_at_m = (qq == nb1) & (m0 >= 3)
    n_at_3 = (m6 > 6) & (qq == nb2) & (m0 >= 3)
    n_unit = jnp.where(n_at_full, 6,
                       jnp.where(n_at_m, jnp.where(m6 > 6, m6 - 3, m6), 3))
    n_emit = (q == 0) | (n_small & (qq >= 0)) | n_at_full | n_at_m | n_at_3
    n_is_rep = (q > 0) & ~n_small
    n_sym = jnp.where(n_is_rep, 16, v)
    n_extra = jnp.where(n_is_rep, n_unit - 3, 0)

    zero = v == 0
    sym = jnp.where(zero, z_sym, n_sym)
    extra = jnp.where(zero, z_extra, n_extra)
    emit = jnp.where(zero, z_emit, n_emit) & live
    return (jnp.where(emit, sym, 0), jnp.where(emit, extra, 0), emit)


def _block_entropy(lfreq, dfreq, live, cfg: levels_mod.LevelConfig,
                   fixed_codes: bool = False):
    """Per-sub-block entropy stage (vmapped; all arrays are tiny): dynamic
    trees, precode RLE, header items, exact static-vs-dynamic cost decision.

    live: scalar bool — dead groups emit nothing (all nbits zero).
    Returns (hdr_lo, hdr_nb (HDR_ITEMS,), el, er (286,), edl, edr (30,),
    eob_lo, eob_nb) — emission tables already select dynamic vs fixed codes.
    """
    lext_bits = jnp.concatenate(
        [jnp.zeros(257, jnp.int32), jnp.asarray(C.LENGTH_EXTRA)])
    dext_bits = jnp.asarray(C.DIST_EXTRA)

    # dynamic trees: package-merge minimizes the BODY bits exactly, but a
    # different length multiset can cost more in the precode-RLE'd HEADER;
    # at levels 8-9 (tree_both) both candidates are evaluated end-to-end and
    # the cheaper total wins per group — never worse than either builder
    # alone (measured: PM alone is +0.068% at level 9's 2 KiB groups).
    def _with_trees(dl, dd):
        ret = _entropy_with_trees(dl, dd, lfreq, dfreq, live, lext_bits,
                                  dext_bits, fixed_codes)
        return ret

    dl1 = huffman.code_lengths_pm(lfreq, C.MAX_CODE_BITS)
    dd1 = huffman.code_lengths_pm(dfreq, C.MAX_CODE_BITS)
    out1, cost1 = _with_trees(dl1, dd1)
    if not getattr(cfg, "tree_both", False):
        return out1
    dl2 = huffman.code_lengths(lfreq, C.MAX_CODE_BITS)
    dd2 = huffman.code_lengths(dfreq, C.MAX_CODE_BITS)
    out2, cost2 = _with_trees(dl2, dd2)
    pick1 = cost1 <= cost2
    return tuple(jnp.where(pick1, a, b) for a, b in zip(out1, out2))


def _entropy_with_trees(dl, dd, lfreq, dfreq, live, lext_bits, dext_bits,
                        fixed_codes):
    """Header + emission tables + exact total cost for one candidate tree
    pair (split out of _block_entropy so level 8-9 can compare builders)."""
    _, dlr = huffman.canonical_codes(dl, C.MAX_CODE_BITS)
    _, ddr = huffman.canonical_codes(dd, C.MAX_CODE_BITS)

    # header: HLIT/HDIST + combined length array + RLE
    symidx = jnp.arange(C.NUM_LITLEN_USED, dtype=jnp.int32)
    hlit = jnp.maximum(257, jnp.max(jnp.where(dl > 0, symidx + 1, 0)))
    didx = jnp.arange(C.NUM_DIST_USED, dtype=jnp.int32)
    hdist = jnp.maximum(1, jnp.max(jnp.where(dd > 0, didx + 1, 0)))

    ncomb = C.NUM_LITLEN_USED + C.NUM_DIST_USED
    comb = jnp.full(ncomb + C.NUM_DIST_USED, _SENT, jnp.int32)
    comb = comb.at[symidx].set(jnp.where(symidx < hlit, dl, _SENT))
    comb = comb.at[hlit + didx].set(jnp.where(didx < hdist, dd, _SENT))
    comb = comb[:ncomb]
    rle_sym, rle_extra, rle_emit = _rle_emit(comb)

    pfreq = jnp.zeros(C.NUM_PRECODE, jnp.int32).at[rle_sym].add(
        rle_emit.astype(jnp.int32))
    pl = huffman.code_lengths_pm(pfreq, C.MAX_PRECODE_BITS)
    _, plr = huffman.canonical_codes(pl, C.MAX_PRECODE_BITS)
    porder = jnp.asarray(C.PRECODE_ORDER)
    pl_perm = pl[porder]
    pidx = jnp.arange(C.NUM_PRECODE, dtype=jnp.int32)
    lastp = jnp.max(jnp.where(pl_perm > 0, pidx + 1, 0))
    hclen = jnp.maximum(lastp, 4) - 4

    pextra_bits = jnp.asarray(_P_EXTRA)

    # exact costs (flushblock decision, deflator.c:1752-1772)
    extra_cost = jnp.sum(lfreq * lext_bits) + jnp.sum(dfreq * dext_bits)
    hdr_cost = 14 + 3 * (hclen + 4) + jnp.sum(
        jnp.where(rle_emit, pl[rle_sym] + pextra_bits[rle_sym], 0))
    dyn_cost = jnp.sum(lfreq * dl) + jnp.sum(dfreq * dd) + extra_cost + hdr_cost
    fll = jnp.asarray(C.FIXED_LITLEN_LENGTHS)[:C.NUM_LITLEN_USED]
    stat_cost = jnp.sum(lfreq * fll) + jnp.sum(dfreq * 5) + extra_cost
    # DEFLT_FIXEDCODES analog (deflator.h:74-76): force the static trees
    use_dyn = (dyn_cost < stat_cost) & (not fixed_codes)

    # emission tables (per-group select dynamic vs fixed)
    flr = jnp.asarray(C.FIXED_LITLEN_CODES_REV)[:C.NUM_LITLEN_USED]
    fdr = jnp.asarray(C.FIXED_DIST_CODES_REV)[:C.NUM_DIST_USED]
    fdl = jnp.asarray(C.FIXED_DIST_LENGTHS)[:C.NUM_DIST_USED]
    el = jnp.where(use_dyn, dl, fll)
    er = jnp.where(use_dyn, dlr, flr).astype(jnp.uint32)
    edl = jnp.where(use_dyn, dd, fdl)
    edr = jnp.where(use_dyn, ddr, fdr).astype(jnp.uint32)

    # ---- header items ----
    hdr_lo = jnp.zeros(HDR_ITEMS, jnp.uint32)
    hdr_nb = jnp.zeros(HDR_ITEMS, jnp.int32)
    btype = jnp.where(use_dyn, 2, 1).astype(jnp.uint32)
    hdr_lo = hdr_lo.at[0].set(btype << 1)        # BFINAL or'd in at batch level
    hdr_nb = hdr_nb.at[0].set(jnp.where(live, 3, 0))

    dynhdr = ((hlit - 257) | ((hdist - 1) << 5) | (hclen << 10)).astype(jnp.uint32)
    hdr_lo = hdr_lo.at[1].set(jnp.where(use_dyn, dynhdr, 0))
    hdr_nb = hdr_nb.at[1].set(jnp.where(live & use_dyn, 14, 0))

    pc_n = jnp.where(live & use_dyn & (pidx < hclen + 4), 3, 0)
    hdr_lo = hdr_lo.at[2:21].set(jnp.where(pc_n > 0, pl_perm.astype(jnp.uint32), 0))
    hdr_nb = hdr_nb.at[2:21].set(pc_n)

    rle_n = jnp.where(live & use_dyn & rle_emit,
                      pl[rle_sym] + pextra_bits[rle_sym], 0)
    rle_v = (plr[rle_sym].astype(jnp.uint32)
             | (rle_extra.astype(jnp.uint32) << pl[rle_sym].astype(jnp.uint32)))
    hdr_lo = hdr_lo.at[21:21 + ncomb].set(jnp.where(rle_n > 0, rle_v, 0))
    hdr_nb = hdr_nb.at[21:21 + ncomb].set(rle_n)

    eob_lo = jnp.where(live, er[C.EOB], 0)
    eob_nb = jnp.where(live, el[C.EOB], 0)
    return (hdr_lo, hdr_nb, el, er, edl, edr, eob_lo, eob_nb), dyn_cost


def _split_dp(Pl, Pd, nch: int, c0=_SPLIT_HDR_C0, c1=_SPLIT_HDR_C1):
    """Optimal contiguous chunk partition for ONE block (vmapped over batch).

    Pl: (nch+1, NL) i32 prefix histograms (chunk symbol freqs), Pd likewise
    for the distance alphabet. Minimizes sum over groups of
    entropy(merged hist) + estimated dynamic-header bits — the batch-parallel
    replacement for the reference's online histogram-drift splitter
    (shouldsplit, src/deflator.c:2556-2596). Returns (nch,) bool group-start
    flags (flag[0] always True).
    """
    hl = Pl[None, :, :] - Pl[:, None, :]      # (nch+1, nch+1, NL); valid i<j
    hd = Pd[None, :, :] - Pd[:, None, :]

    def ent(h):
        tot = jnp.sum(h, -1, keepdims=True).astype(jnp.float32)
        hf = h.astype(jnp.float32)
        return jnp.sum(
            jnp.where(h > 0,
                      hf * (jnp.log2(jnp.maximum(tot, 1.0))
                            - jnp.log2(jnp.maximum(hf, 1.0))), 0.0), -1)

    distinct = (jnp.sum((hl > 0).astype(jnp.int32), -1)
                + jnp.sum((hd > 0).astype(jnp.int32), -1)).astype(jnp.float32)
    cost = ent(hl) + ent(hd) + np.float32(c0) + np.float32(c1) * distinct

    INF = np.float32(3e18)
    best = jnp.full((nch + 1,), INF, jnp.float32).at[0].set(0.0)
    arg = jnp.zeros((nch + 1,), jnp.int32)
    iidx = jnp.arange(nch + 1, dtype=jnp.int32)
    for j in range(1, nch + 1):                 # static unroll (nch <= 8)
        cand = jnp.where(iidx < j, best + cost[:, j], INF)
        arg = arg.at[j].set(jnp.argmin(cand).astype(jnp.int32))
        best = best.at[j].set(jnp.min(cand))

    start = jnp.zeros((nch,), jnp.bool_)
    j = jnp.int32(nch)
    for _ in range(nch):                        # backtrack, <= nch hops
        start = jnp.where(j > 0, start.at[jnp.clip(arg[j], 0, nch - 1)].set(
            True), start)
        j = jnp.where(j > 0, arg[j], 0)
    return start.at[0].set(True)


def encode_batch_impl(data: jnp.ndarray, start_block: jnp.ndarray,
                      total_len: jnp.ndarray, dict_len: jnp.ndarray,
                      final_block: jnp.ndarray,
                      bl: int, batch: int, level: int, num_words: int,
                      fixed_codes: bool = False, stage: str = ""):
    """Encode `batch` consecutive blocks of `data` into one bit-contiguous
    DEFLATE fragment (each block adaptively split into sub-blocks).

    data: (HALO + N_padded + PAD,) u8 — input with a HALO-byte history prefix
      (zeros or preset dictionary, cf. deflator_setdctnr deflator.c:2106-2167)
      and PAD trailing zeros.
    start_block: scalar i32 — index of the first block to encode.
    total_len: scalar i32 — true input length (bytes).
    dict_len: scalar i32 — preset dictionary bytes available to block 0.
    final_block: scalar i32 — global index of the stream's last block (gets
      BFINAL, cf. endstream deflator.c:609-654).

    Returns (words u32[num_words], total_bits, block_bits (batch,), ntok,
    start_flags (batch, nch), hdr_off (batch, nch), gwin (batch, nch) window
    counts per group, wanch (batch, A_BLK) window anchors, use_stored
    (batch,)).
    """
    cfg = levels_mod.get_level(level)
    nch = _nch(bl, cfg.chunk)
    CH = bl // nch
    CS = 1 + HDR_ITEMS + CH       # virtual per-position stride (anchors)
    CHP = CH // 2                 # token slots pair-combined for pack()
    CSP = 1 + HDR_ITEMS + CHP     # packed chunk stride
    nitems = nch * CS + 1         # virtual (per-position) item count
    nitemsp = nch * CSP + 1       # packed item count
    NL = C.NUM_LITLEN_USED
    ND = C.NUM_DIST_USED
    B = batch

    bidx = start_block + jnp.arange(batch, dtype=jnp.int32)
    starts = bidx * bl                    # offsets into the logical input
    block_len = jnp.clip(total_len - starts, 0, bl)
    # History available to block b: preceding stream bytes plus the preset
    # dictionary, capped at the 32 KiB window.
    avail = jnp.minimum(starts + dict_len, HALO)
    valid_from = HALO - avail
    bfinal = (bidx == final_block).astype(jnp.int32)

    ext = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s,), (HALO + bl + PAD,))
    )(starts)

    # ---- batch-flat token pipeline (see ops/lz77.py layout note) ----
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        ext_top=cfg.ext_top, ext_rounds=cfg.ext_rounds, rescue=cfg.rescue,
        probe_words=cfg.probe_words, ext_mdiv=cfg.ext_mdiv)
    if stage == "match":
        return length, dist
    take = lz77.parse_take(length, dist, block_len, cfg.lazy, cfg.good_length)
    # sequential-parse equivalent via the match-space walk (Pallas on TPU):
    # runs once per emitted match, not once per position
    is_tok, t_take = lz77.token_marks_batch(length, take, block_len, bl)
    if stage == "walk":
        return is_tok, t_take
    t_len = jnp.where(t_take, length, 0)
    t_dist = jnp.where(t_take, dist, 0)
    t_lit = ext[:, HALO:HALO + bl].astype(jnp.int32)

    # arithmetic symbol mapping (no table gathers):
    # length n = len-3 in [0,255]; sym = 257+n (n<8) else
    # 265 + 4*(log2(n)-3) + ((n>>(log2(n)-2)) & 3); len 258 -> 285
    n_ = jnp.maximum(t_len - 3, 0)
    l2n = lz77._floor_log2(jnp.maximum(n_, 1))
    lsym_m = jnp.where(
        n_ < 8, 257 + n_,
        265 + ((l2n - 3) << 2) + ((n_ >> jnp.maximum(l2n - 2, 0)) & 3))
    lsym_m = jnp.where(t_len == 258, 285, lsym_m)
    lextra_bits = jnp.where((n_ < 8) | (t_len == 258), 0, l2n - 2)
    lextra = n_ & ((1 << jnp.maximum(lextra_bits, 0)) - 1)
    # dist m = d-1; sym = m (m<4) else 2*log2(m) + ((m>>(log2(m)-1)) & 1)
    m_ = jnp.maximum(t_dist - 1, 0)
    l2m = lz77._floor_log2(jnp.maximum(m_, 1))
    dsym = jnp.where(m_ < 4, m_,
                     (l2m << 1) + ((m_ >> jnp.maximum(l2m - 1, 0)) & 1))
    dextra_bits = jnp.where(m_ < 4, 0, l2m - 1)
    dextra = m_ & ((1 << jnp.maximum(dextra_bits, 0)) - 1)

    lsym = jnp.where(t_take, lsym_m, t_lit)

    # ---- per-chunk frequencies (one-hot matmuls on the MXU) ----
    # freq[c, s] = sum_p [sym_p == s] is a gather/scatter-free contraction:
    # factor the 286-symbol litlen alphabet as s = hi*16 + lo (18 x 16) so
    # the one-hot operands stay small, then freq = A^T @ (B * v) rides the
    # MXU (the flat scatter-add this replaces ran ~9 ms/MB at 0.14 G elem/s
    # on v5e; counts <= CH are exact in f32 accumulation). The same A/B
    # one-hots are reused by the code-lookup contraction below.
    pos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    NHI = 18                                   # ceil(286 / 16)
    ls_c = lsym.reshape(B * nch, CH)
    hi5 = (ls_c >> 4).astype(jnp.int32)
    lo4 = (ls_c & 15).astype(jnp.int32)
    ghi = jnp.arange(NHI, dtype=jnp.int32)
    glo = jnp.arange(16, dtype=jnp.int32)
    A_hi = (hi5[:, :, None] == ghi[None, None, :]).astype(jnp.bfloat16)
    B_lo = (lo4[:, :, None] == glo[None, None, :]).astype(jnp.bfloat16)
    v_tok = is_tok.reshape(B * nch, CH).astype(jnp.bfloat16)
    lf2 = jnp.einsum("cpg,cpj->cgj", A_hi, B_lo * v_tok[:, :, None],
                     preferred_element_type=jnp.float32)
    lfreq_c = lf2.reshape(B, nch, NHI * 16)[
        :, :, :NL].astype(jnp.int32)
    ds_c = dsym.reshape(B * nch, CH)
    gds = jnp.arange(ND, dtype=jnp.int32)
    D_oh = (ds_c[:, :, None] == gds[None, None, :]).astype(jnp.bfloat16)
    mt = (t_take & is_tok).reshape(B * nch, CH).astype(jnp.bfloat16)
    dfreq_c = jnp.einsum("cps,cp->cs", D_oh, mt,
                         preferred_element_type=jnp.float32)
    dfreq_c = dfreq_c.reshape(B, nch, ND).astype(jnp.int32)

    if stage == "freqs":
        return lfreq_c, dfreq_c
    # ---- adaptive split (entropy DP over chunk histograms) ----
    zl = jnp.zeros((B, 1, NL), jnp.int32)
    zd = jnp.zeros((B, 1, ND), jnp.int32)
    Pl = jnp.concatenate([zl, jnp.cumsum(lfreq_c, axis=1)], axis=1)
    Pd = jnp.concatenate([zd, jnp.cumsum(dfreq_c, axis=1)], axis=1)
    ci = jnp.arange(nch, dtype=jnp.int32)
    if nch > 1 and cfg.level >= 1:
        start_f = jax.vmap(lambda a, b: _split_dp(
            a, b, nch, cfg.split_c0, cfg.split_c1))(Pl, Pd)
    else:
        start_f = jnp.zeros((B, nch), jnp.bool_).at[:, 0].set(True)

    if stage == "split":
        return start_f
    # group-of-chunk, start-chunk-of-group, end-chunk (exclusive) per start
    gs = jax.lax.cummax(jnp.where(start_f, ci[None, :], 0), axis=1)  # (B, nch)
    srt = jnp.where(start_f, ci[None, :], nch)
    arr = jnp.concatenate([srt[:, 1:], jnp.full((B, 1), nch, jnp.int32)], 1)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(arr, 1), axis=1), 1)      # (B, nch)

    # per-group freqs at start chunks: P[nxt] - P[c]
    def gsel(P, idx):
        return jnp.take_along_axis(P, idx[:, :, None], axis=1)
    lfreq_g = gsel(Pl, nxt) - gsel(Pl, ci[None, :] * jnp.ones(
        (B, 1), jnp.int32))
    dfreq_g = gsel(Pd, nxt) - gsel(Pd, ci[None, :] * jnp.ones(
        (B, 1), jnp.int32))
    live_g = start_f & (ci[None, :] * CH < block_len[:, None])       # (B, nch)
    lfreq_g = lfreq_g.at[:, :, C.EOB].add(live_g.astype(jnp.int32))

    hdr_lo, hdr_nb, el, er, edl, edr, eob_lo, eob_nb = jax.vmap(
        lambda lf, df, lv: _block_entropy(lf, df, lv, cfg, fixed_codes)
    )(lfreq_g.reshape(B * nch, NL), dfreq_g.reshape(B * nch, ND),
      live_g.reshape(B * nch))
    if stage == "entropy":
        return hdr_lo, hdr_nb, el, er, edl, edr
    hdr_lo = hdr_lo.reshape(B, nch, HDR_ITEMS)
    hdr_nb = hdr_nb.reshape(B, nch, HDR_ITEMS)

    # BFINAL on the last live sub-block of the stream's final block
    lastc = jnp.max(jnp.where(live_g, ci[None, :], -1), axis=1)      # (B,)
    fin_mask = (bfinal[:, None] > 0) & (ci[None, :] == lastc[:, None]) & live_g
    hdr_lo = hdr_lo.at[:, :, 0].set(
        hdr_lo[:, :, 0] | fin_mask.astype(jnp.uint32))

    # broadcast each group's tables to its member chunks
    def bcast(x, n):
        return jnp.take_along_axis(x.reshape(B, nch, n), gs[:, :, None], 1)
    el_a = bcast(el, NL)
    er_a = bcast(er, NL)
    edl_a = bcast(edl, ND)
    edr_a = bcast(edr, ND)
    eob_lo_a = jnp.take_along_axis(eob_lo.reshape(B, nch), gs, 1)
    eob_nb_a = jnp.take_along_axis(eob_nb.reshape(B, nch), gs, 1)
    live_a = jnp.take_along_axis(live_g, gs, 1)                      # (B, nch)

    # two packed code lookups per position: litlen (codes<<4|len) and dist.
    # Gather-free: le[c,p] = sum_g A[p,g] * (sum_j B[p,j] * T[c,g,j]) — the
    # factored one-hots select the table entry via two small contractions
    # (each sum has exactly one nonzero term and entries < 2^20, so f32 is
    # exact; the 1M-wide gather this replaces ran ~7 ms/MB).
    lpack = (er_a << 4) | el_a.astype(jnp.uint32)          # (B, nch, 286)
    dpack = (edr_a << 4) | edl_a.astype(jnp.uint32)        # (B, nch, 30)
    Tl = jnp.zeros((B * nch, NHI * 16), jnp.float32).at[:, :NL].set(
        lpack.reshape(B * nch, NL).astype(jnp.float32)).reshape(
        B * nch, NHI, 16)
    # Precision.HIGHEST (bf16x3) is exact here: one-hot entries are exactly
    # 1.0 and table entries < 2^20 decompose exactly into three 8-bit bf16
    # mantissa chunks; the TPU default (single-pass bf16) is NOT exact and
    # corrupts codes
    HI = jax.lax.Precision.HIGHEST
    Cl = jnp.einsum("cpj,cgj->cpg", B_lo.astype(jnp.float32), Tl,
                    precision=HI, preferred_element_type=jnp.float32)
    le_f = jnp.einsum("cpg,cpg->cp", A_hi.astype(jnp.float32), Cl,
                      precision=HI, preferred_element_type=jnp.float32)
    le = le_f.astype(jnp.uint32).reshape(B, bl)
    de_f = jnp.einsum("cps,cs->cp", D_oh.astype(jnp.float32),
                      dpack.reshape(B * nch, ND).astype(jnp.float32),
                      precision=HI, preferred_element_type=jnp.float32)
    de = de_f.astype(jnp.uint32).reshape(B, bl)
    lcode = le >> 4
    llen = (le & 15).astype(jnp.int32)
    dcode = de >> 4
    dlen = (de & 15).astype(jnp.int32)

    if stage == "codes":
        return le, de
    # literal: lcode/llen alone; match: lcode+lextra+dcode+dextra
    m_lo = lcode
    m_hi = jnp.zeros((B, bl), jnp.uint32)
    m_n = llen
    m_lo, m_hi, m_n = bitpack.append_bits(m_lo, m_hi, m_n, lextra, lextra_bits)
    m_lo, m_hi, m_n = bitpack.append_bits(m_lo, m_hi, m_n, dcode, dlen)
    m_lo, m_hi, m_n = bitpack.append_bits(m_lo, m_hi, m_n, dextra, dextra_bits)
    tv_lo = jnp.where(t_take, m_lo, lcode)
    tv_hi = jnp.where(t_take, m_hi, 0)
    tv_n = jnp.where(is_tok, jnp.where(t_take, m_n, llen), 0)

    # ---- pair-combine adjacent token slots (any adjacent pair <= 63 bits:
    # a match start is followed by a covered 0-bit position; worst case
    # literal + match start = 15 + 48) — halves pack()'s item count, whose
    # boundary scatter scales with N (measured 9.8 ms at 1.1M items) ----
    tvm_lo = jnp.where(tv_n > 0, tv_lo, 0)
    tvm_hi = jnp.where(tv_n > 0, tv_hi, 0)
    tvp_lo, tvp_hi, tvp_n = bitpack.combine64(
        tvm_lo[:, 0::2], tvm_hi[:, 0::2], tv_n[:, 0::2],
        tvm_lo[:, 1::2], tvm_hi[:, 1::2], tv_n[:, 1::2])

    # ---- item assembly: (B, nch, CSP) = [eob slot | header | CH/2 pairs] ----
    ch_lo = jnp.zeros((B, nch, CSP), jnp.uint32)
    ch_hi = jnp.zeros((B, nch, CSP), jnp.uint32)
    ch_nb = jnp.zeros((B, nch, CSP), jnp.int32)
    # eob slot c: previous group's EOB, emitted where a new group starts
    prev_eob_lo = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint32), eob_lo_a[:, :-1]], 1)
    prev_eob_nb = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), eob_nb_a[:, :-1]], 1)
    prev_live = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.bool_), live_a[:, :-1]], 1)
    eob_emit = start_f & prev_live & (ci[None, :] > 0)
    ch_lo = ch_lo.at[:, :, 0].set(jnp.where(eob_emit, prev_eob_lo, 0))
    ch_nb = ch_nb.at[:, :, 0].set(jnp.where(eob_emit, prev_eob_nb, 0))
    ch_lo = ch_lo.at[:, :, 1:1 + HDR_ITEMS].set(hdr_lo)
    ch_nb = ch_nb.at[:, :, 1:1 + HDR_ITEMS].set(hdr_nb)
    ch_lo = ch_lo.at[:, :, 1 + HDR_ITEMS:].set(tvp_lo.reshape(B, nch, CHP))
    ch_hi = ch_hi.at[:, :, 1 + HDR_ITEMS:].set(tvp_hi.reshape(B, nch, CHP))
    ch_nb = ch_nb.at[:, :, 1 + HDR_ITEMS:].set(tvp_n.reshape(B, nch, CHP))
    # final slot: last group's EOB
    fin_lo = jnp.where(live_a[:, -1], eob_lo_a[:, -1], 0)
    fin_nb = jnp.where(live_a[:, -1], eob_nb_a[:, -1], 0)
    lo = jnp.concatenate([ch_lo.reshape(B, nch * CSP), fin_lo[:, None]], 1)
    hi = jnp.concatenate([ch_hi.reshape(B, nch * CSP),
                          jnp.zeros((B, 1), jnp.uint32)], 1)
    nb = jnp.concatenate([ch_nb.reshape(B, nch * CSP), fin_nb[:, None]], 1)
    ntok = jnp.sum(is_tok.astype(jnp.int32))
    if stage == "items":
        return lo, hi, nb

    # ---- stored-block fallback (compress0 semantics, deflator.c:796-926) ----
    # A stored block costs 3 hdr bits + pad-to-byte + 32 LEN/NLEN bits + 8n,
    # split in two sub-blocks when n exceeds the 16-bit LEN field. The pad
    # depends on the block's starting bit offset mod 8, so an 8-state scan
    # over the batch decides stored-vs-compressed and the final bit counts.
    comp_bits = jnp.sum(nb, axis=1)
    split = 32768
    len1 = jnp.minimum(block_len, split)
    len2 = block_len - len1

    def align_step(s, cb_and_len):
        cb, n, n2 = cb_and_len
        pad = (8 - ((s + 3) & 7)) & 7
        stored = jnp.where(n > 0, 3 + pad + 32 + 8 * n + jnp.where(n2 > 0, 40, 0),
                           jnp.int32(0))
        use_stored = (n > 0) & ((cfg.level == 0) | (stored < cb))
        bits = jnp.where(use_stored, stored, cb)
        return (s + bits) & 7, (use_stored, pad, bits)

    _, (use_stored, pad_bits, final_bits) = jax.lax.scan(
        align_step, jnp.int32(0), (comp_bits, block_len, len2))

    if cfg.level == 0:
        use_stored = jnp.where(block_len > 0, True, False)

    # stored item arrays in the same layout, then per-block select
    lennlen1 = (len1 | ((len1 ^ 0xFFFF) << 16)).astype(jnp.uint32)
    lennlen2 = (len2 | ((len2 ^ 0xFFFF) << 16)).astype(jnp.uint32)
    has2 = len2 > 0
    s_lo = jnp.zeros((B, nch, CSP), jnp.uint32)
    s_hi = jnp.zeros((B, nch, CSP), jnp.uint32)
    s_nb = jnp.zeros((B, nch, CSP), jnp.int32)
    hdr_v = jnp.where(has2, 0, bfinal).astype(jnp.uint32)
    s_lo = s_lo.at[:, 0, 1].set(hdr_v)
    s_nb = s_nb.at[:, 0, 1].set(jnp.where(block_len > 0, 3, 0))
    p_lo, p_hi, p_n = bitpack.append_bits(
        jnp.zeros_like(lennlen1), jnp.zeros_like(lennlen1),
        pad_bits.astype(jnp.int32), lennlen1, jnp.int32(32))
    s_lo = s_lo.at[:, 0, 2].set(p_lo)
    s_hi = s_hi.at[:, 0, 2].set(p_hi)
    s_nb = s_nb.at[:, 0, 2].set(jnp.where(block_len > 0, p_n, 0))
    # second stored header at the 32 KiB boundary chunk's eob slot
    h2_v = (bfinal.astype(jnp.uint32) | (lennlen2 << 8))
    h2_hi = (lennlen2 >> 24)
    if bl > split:
        c2 = split // CH
        s_lo = s_lo.at[:, c2, 0].set(h2_v)
        s_hi = s_hi.at[:, c2, 0].set(h2_hi)
        s_nb = s_nb.at[:, c2, 0].set(jnp.where(has2, 40, 0))
    blk_bytes = ext[:, HALO:HALO + bl].astype(jnp.uint32)
    jpos = pos                                    # (1, bl) global byte index
    live_b = (jpos < block_len[:, None])
    # paired raw bytes (dead positions are a suffix, so live0 >= live1)
    b0 = jnp.where(live_b, blk_bytes, 0)[:, 0::2]
    b1 = jnp.where(live_b, blk_bytes, 0)[:, 1::2]
    s_lo = s_lo.at[:, :, 1 + HDR_ITEMS:].set(
        (b0 | (b1 << 8)).reshape(B, nch, CHP))
    s_nb = s_nb.at[:, :, 1 + HDR_ITEMS:].set(
        (8 * (live_b[:, 0::2].astype(jnp.int32)
              + live_b[:, 1::2].astype(jnp.int32))).reshape(B, nch, CHP))
    s_lo_f = jnp.concatenate([s_lo.reshape(B, nch * CSP),
                              jnp.zeros((B, 1), jnp.uint32)], 1)
    s_hi_f = jnp.concatenate([s_hi.reshape(B, nch * CSP),
                              jnp.zeros((B, 1), jnp.uint32)], 1)
    s_nb_f = jnp.concatenate([s_nb.reshape(B, nch * CSP),
                              jnp.zeros((B, 1), jnp.int32)], 1)

    sel = use_stored[:, None]
    lo = jnp.where(sel, s_lo_f, lo)
    hi = jnp.where(sel, s_hi_f, hi)
    nb = jnp.where(sel, s_nb_f, nb)

    if stage == "stored":
        return lo, hi, nb
    words, offs, total = bitpack.pack(
        lo.reshape(-1), hi.reshape(-1), nb.reshape(-1), num_words)
    if stage == "pack":
        return words, total
    per_block_bits = jnp.sum(nb, axis=1)
    offs2p = offs.reshape(B, nitemsp)

    # per-chunk header bit offsets (index entries for parallel decode)
    hdr_idx = (ci * CSP + 1)[None, :] * jnp.ones((B, 1), jnp.int32)
    hdr_off = jnp.take_along_axis(offs2p, hdr_idx, 1)                # (B, nch)

    # reconstruct per-POSITION offsets/widths in the virtual (unpaired)
    # layout for the window-anchor scan: the odd position of a pair sits
    # n_even bits after the pair's offset
    nb_pos = jnp.where(use_stored[:, None],
                       jnp.where(live_b, 8, 0), tv_n)               # (B, bl)
    off3 = offs2p[:, :nitemsp - 1].reshape(B, nch, CSP)
    tok_off_p = off3[:, :, 1 + HDR_ITEMS:]                          # (B,nch,CHP)
    n_even = nb_pos[:, 0::2].reshape(B, nch, CHP)
    tok_off = jnp.stack([tok_off_p, tok_off_p + n_even],
                        axis=-1).reshape(B, nch, CH)
    offs2 = jnp.concatenate([
        jnp.concatenate([off3[:, :, :1 + HDR_ITEMS], tok_off],
                        axis=2).reshape(B, nch * CS),
        offs2p[:, -1:]], axis=1)                                    # (B,nitems)
    nb3 = nb[:, :nitemsp - 1].reshape(B, nch, CSP)
    nbv = jnp.concatenate([
        jnp.concatenate([nb3[:, :, :1 + HDR_ITEMS],
                         nb_pos.reshape(B, nch, CH)],
                        axis=2).reshape(B, nch * CS),
        nb[:, -1:]], axis=1)

    if stage == "offsets":
        return offs2, nbv
    # ---- window anchors for the parallel walk (ops/walk.py) ----
    # The stream is cut on a 32-bit word grid anchored at each group's first
    # symbol bit (& ~31); for every window, record the bit offset of the
    # first symbol starting in it. These are the exact decode-lane entry
    # points — the bitpack scan knows every symbol's offset for free, so the
    # index costs one scatter-min.
    kind = np.zeros(nitems, np.int32)             # 0 hdr, 1 token, 2 eob/final
    sc_np = np.zeros(nitems, np.int32)            # owning chunk per item
    for c in range(nch):
        base = c * CS
        kind[base] = 2
        sc_np[base] = max(c - 1, 0)
        kind[base + 1 + HDR_ITEMS: base + CS] = 1
        sc_np[base + 1 + HDR_ITEMS: base + CS] = c
    kind[nitems - 1] = 2
    sc_np[nitems - 1] = nch - 1

    sym_mask = (nbv > 0) & (kind[None, :] > 0)
    # group sym-start offset, per chunk (the group that owns chunk c)
    gso = jnp.take_along_axis(offs2, gs * CS + 1 + HDR_ITEMS, axis=1)
    gsc = gs[:, sc_np]                            # (B, nitems) owning start chunk
    org_it = gso[:, sc_np] & ~31
    wid = (offs2 - org_it) >> 5                   # window id within the group
    # gwin[b, g] = max window id + 1 over the group's sym items. The old
    # 1.1M-element .at[].max scatter ran ~7 ms (XLA scatter ~0.14 G elem/s);
    # a structured reduce is near-free: per-chunk max over the virtual
    # layout (eob slots belong to the PREVIOUS chunk's group, handled by a
    # shifted fold), then an 8x8 one-hot max folds chunks into groups.
    wv = jnp.where(sym_mask, wid + 1, 0)                      # (B, nitems)
    wv3 = wv[:, :nitems - 1].reshape(B, nch, CS)
    cmax = jnp.max(wv3[:, :, 1:], axis=2)                     # (B, nch)
    eobv = wv3[:, :, 0]                # chunk c's eob slot -> chunk c-1
    cmax = cmax.at[:, :-1].set(jnp.maximum(cmax[:, :-1], eobv[:, 1:]))
    cmax = cmax.at[:, nch - 1].set(
        jnp.maximum(cmax[:, nch - 1], wv[:, -1]))             # final item
    own = gs[:, :, None] == ci[None, None, :]                 # (B, c, g)
    gwin = jnp.max(jnp.where(own, cmax[:, :, None], 0), axis=1)
    gbase = jnp.cumsum(gwin, axis=1) - gwin       # exclusive, per block
    aidx = jnp.take_along_axis(gbase, gsc, axis=1) + wid
    A_BLK = anchors_cap(bl, cfg.chunk)
    BIGA = np.int32(1 << 30)
    # anchor a's value = offs2 of the FIRST sym item in window a. aidx is
    # non-decreasing along items (offsets ascend; gbase ascends across
    # groups), so first-in-window items have strictly increasing aidx —
    # the scatter becomes per-block sorted with at most one update per
    # target, which XLA lowers far cheaper than the old full-item
    # min-scatter over every symbol (~15 ms at 1.1M updates).
    lsa = jax.lax.cummax(jnp.where(sym_mask, aidx, -1), axis=1)
    lsa_prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), lsa[:, :-1]], axis=1)
    fw = sym_mask & (aidx > lsa_prev) & (aidx >= 0) & (aidx < A_BLK)
    tgtb = jnp.where(fw, aidx, A_BLK + 1)          # OOB -> dropped
    valsb = jnp.where(fw, offs2, BIGA)
    wanch = jax.vmap(
        lambda t, v: jnp.full(A_BLK, BIGA, jnp.int32).at[t].min(
            v, mode="drop", indices_are_sorted=True))(tgtb, valsb)

    return (words, total, per_block_bits, jnp.sum(ntok), start_f, hdr_off,
            gwin, wanch, use_stored)


encode_batch = jax.jit(
    encode_batch_impl, static_argnames=("bl", "batch", "level", "num_words",
                                        "fixed_codes"))


@functools.partial(jax.jit, static_argnames=("bl", "batch", "level",
                                             "num_words", "fixed_codes"))
def encode_batch_packed(data, start_block, total_len, dict_len, final_block,
                        bl: int, batch: int, level: int, num_words: int,
                        fixed_codes: bool = False):
    """encode_batch + all small outputs packed into ONE i32 array.

    The axon backend drops a process into synchronous per-dispatch mode after
    its first device->host read, so drivers dispatch every batch first and
    read back once per batch afterwards; packing shrinks that to two reads
    (words + meta) per batch. meta = [total, ntok, per_block(batch),
    stored(batch), start_flags(batch*nch), hdr_off(batch*nch),
    gwin(batch*nch)]; window anchors ride a second array.
    """
    (words, total, per_block, ntok, start_f, hdr_off, gwin,
     wanch, stored) = encode_batch_impl(
        data, start_block, total_len, dict_len, final_block,
        bl, batch, level, num_words, fixed_codes)
    meta = jnp.concatenate([
        total[None] if total.ndim else jnp.reshape(total, (1,)),
        jnp.reshape(ntok, (1,)),
        per_block.astype(jnp.int32),
        stored.astype(jnp.int32),
        start_f.reshape(-1).astype(jnp.int32),
        hdr_off.reshape(-1).astype(jnp.int32),
        gwin.reshape(-1).astype(jnp.int32),
    ])
    # wanch stays a separate array: only the used prefix of each block row is
    # read back (the d2h tunnel runs ~40 MB/s; the full buffer is ~1.3 MB)
    return words, meta, wanch


def words_bound(bl: int, batch: int, chunk: int = CHUNK) -> int:
    """Static output-word bound: <=11 bits/byte (len-3 far match worst case
    under static codes) plus per-sub-block header slack."""
    return (batch * (11 * bl + 8192 + _nch(bl, chunk) * 4200)) // 32 + 4


def index_entries_from_meta(bl: int, batch: int, startf, hdr_off, gwin,
                            wanch, stored_h, nblocks: int, n_total: int,
                            base_bits: int, base_byte: int,
                            chunk: int = CHUNK):
    """Assemble parallel-decode index entries (bits, bytes, window anchors)
    from one batch's device meta (shared by the single-chip driver and the
    sharded encoder; one entry per emitted sub-block).

    wanch rows hold each block's groups back-to-back (gbase = exclusive
    cumsum of gwin over chunks); a value of >= 2^30 marks a window entirely
    spanned by one symbol (no symbol starts in it) -> -1 in the index."""
    nch = _nch(bl, chunk)
    CH = bl // nch
    index_bits, index_bytes, win_out = [], [], []
    BIGA = 1 << 30
    for i in range(min(batch, nblocks)):
        blk_byte0 = base_byte + i * bl
        if stored_h[i]:
            index_bits.append(base_bits + int(hdr_off[i, 0]))
            index_bytes.append(blk_byte0)
            win_out.append(None)
            continue
        cs_list = [c for c in range(nch)
                   if startf[i, c] and blk_byte0 + c * CH < n_total]
        gbase = {}
        acc = 0
        for c in range(nch):
            gbase[c] = acc
            acc += int(gwin[i, c])
        for c in cs_list:
            nw = int(gwin[i, c])
            a = wanch[i, gbase[c]:gbase[c] + nw].astype(np.int64)
            a = np.where(a >= BIGA, np.int64(-1), a + base_bits)
            index_bits.append(base_bits + int(hdr_off[i, c]))
            index_bytes.append(blk_byte0 + c * CH)
            win_out.append(a)
    return index_bits, index_bytes, win_out


class RawDeflater:
    """Host-side driver producing a complete raw DEFLATE stream (RFC 1951).

    Batches of blocks are encoded on device; batch seams are byte-aligned with
    sync-flush empty stored blocks (zlib Z_SYNC_FLUSH semantics, cf.
    deflator.h:135-141). Returns the byte stream plus a block index enabling
    parallel decode (one entry per emitted sub-block).
    """

    def __init__(self, level: int = 6, block_size: int = 1 << 16,
                 batch: int = 16, fixed_codes: bool = False):
        # the jitted pipeline reshapes blocks into even-sized half-chunks
        # (pair-combined pack items), so block_size must be even; the
        # splitter also assumes whole chunks per block at splitting levels
        if block_size < 256 or block_size % 2:
            raise ValueError(
                f"block_size must be even and >= 256, got {block_size}")
        self.level = level
        self.bl = block_size
        self.batch = batch
        self.fixed_codes = fixed_codes   # DEFLT_FIXEDCODES (deflator.h:74-76)
        # bench hook: when True, compress keeps each segment's device args
        # in last_calls as (dev, start, seg_n, h, final_rel) + the statics
        # via self.call_statics, so the devtime harness re-dispatches the
        # exact program (no monkeypatching of jit wrappers — VERDICT r4 #2)
        self.capture_calls = False
        self.last_calls: list = []
        self.call_statics: tuple = ()

    def compress(self, data: bytes, dictionary: bytes | None = None,
                 final: bool = True):
        """Compress to a raw DEFLATE stream.

        final=False omits BFINAL and terminates with a byte-aligned
        sync-flush seam instead (Z_SYNC_FLUSH / DEFLT_FLUSH semantics,
        deflator.h:135-141), so further segments can be concatenated.
        """
        bl, batch = self.bl, self.batch
        self.last_calls = []
        n = len(data)
        if n == 0:
            if not final:
                return b"", {"block_bits": [], "block_bytes": [],
                             "sync_points": [], "n": 0, "win": []}
            # empty stream: single static block with just EOB = 0x03 0x00
            return b"\x03\x00", {"block_bits": [], "block_bytes": [],
                                 "sync_points": [], "n": 0, "win": []}
        dict_bytes = (dictionary or b"")[-C.WINDOW_SIZE:]
        nblocks = (n + bl - 1) // bl
        arr = np.frombuffer(data, np.uint8)
        chunk = levels_mod.get_level(self.level).chunk
        nch = _nch(bl, chunk)
        CH = bl // nch
        # Fixed-shape segments: one compiled program regardless of input size.
        # Each device call sees exactly (HALO + batch*bl + PAD) bytes; the
        # segment's halo is the preceding 32 KiB of the stream (or the preset
        # dictionary for the first segment).
        seg = batch * bl
        nw = words_bound(bl, batch, chunk)
        out = bytearray()
        index_bits = []          # absolute bit offset of each sub-block start
        index_bytes = []         # output (uncompressed) offset of each sub-block
        sync_points = []
        final_idx = nblocks - 1 if final else -1
        anchors_out = []

        # Phase 1: dispatch every segment (no device->host reads — the first
        # read drops the axon process into sync per-dispatch mode)
        handles = []
        for b0 in range(0, nblocks, batch):
            s = b0 * bl
            seg_n = min(n - s, seg)
            # fresh buffer per segment: dispatch is deferred and jnp.asarray
            # may alias host memory on the CPU backend — reuse would let a
            # later segment overwrite an earlier one's still-unread input
            buf = np.zeros(HALO + seg + PAD, np.uint8)
            h = min(HALO, s + len(dict_bytes))
            if s >= HALO:
                buf[0:HALO] = arr[s - HALO:s]
            elif h:
                hist = dict_bytes[len(dict_bytes) - (h - s):] + data[:s] \
                    if h > s else data[s - h:s]
                buf[HALO - h:HALO] = np.frombuffer(hist, np.uint8)
            buf[HALO:HALO + seg_n] = arr[s:s + seg_n]
            dev = jnp.asarray(buf)
            if self.capture_calls:
                self.last_calls.append(
                    (dev, jnp.int32(0), jnp.int32(seg_n), jnp.int32(h),
                     jnp.int32(final_idx - b0)))
                self.call_statics = (bl, batch, self.level, nw,
                                     self.fixed_codes)
            handles.append((b0, encode_batch_packed(
                dev, jnp.int32(0), jnp.int32(seg_n), jnp.int32(h),
                jnp.int32(final_idx - b0), bl, batch, self.level, nw,
                self.fixed_codes)))

        # Phase 2: read back and assemble
        for b0, (words, meta, wanch_dev) in handles:
            m = np.asarray(meta)
            total = int(m[0])
            pb = m[2:2 + batch]
            stored_h = m[2 + batch:2 + 2 * batch]
            o = 2 + 2 * batch
            startf = m[o:o + batch * nch].reshape(batch, nch)
            o += batch * nch
            hdr_off = m[o:o + batch * nch].reshape(batch, nch)
            o += batch * nch
            gwin = m[o:o + batch * nch].reshape(batch, nch)
            # read back only the used prefix of each block's anchor row
            used = int(gwin.sum(axis=1).max()) if gwin.size else 0
            used = min(max(used, 1), wanch_dev.shape[1])
            wanch = np.asarray(wanch_dev[:, :used])
            # transfer only the produced words (the static bound is ~2x the
            # typical output; d2h runs ~40 MB/s over the axon tunnel)
            total_w = min((total + 31) // 32 + 1, nw)
            if total_w * 2 < nw:
                wb = np.asarray(words[:total_w]).view(np.uint8)
            else:
                wb = np.asarray(words).view(np.uint8)  # little-endian words
            base_bits = len(out) * 8
            ib, iy, ia = index_entries_from_meta(
                bl, batch, startf, hdr_off, gwin, wanch, stored_h,
                nblocks - b0, n, base_bits, b0 * bl, chunk)
            index_bits += ib
            index_bytes += iy
            anchors_out += ia
            if b0 + batch >= nblocks and final:
                out += wb[: (total + 7) // 8].tobytes()
            else:
                # sync flush: 3 zero bits (BFINAL=0, BTYPE=00) + pad + 00 00 ff ff
                out += wb[: (total + 3 + 7) // 8].tobytes()
                out += b"\x00\x00\xff\xff"
                # pad to 4-byte alignment with empty stored blocks so every
                # batch's bit offsets are word-aligned — the walk kernel's
                # 32-bit window grid (ops/walk.py) requires the stream's u32
                # word view to agree with the encoder's local word view
                out += b"\x00\x00\x00\xff\xff" * ((-len(out)) % 4)
                sync_points.append(len(out))
        index = {"block_bits": index_bits, "block_bytes": index_bytes,
                 "sync_points": sync_points, "n": n,
                 "win": anchors_out}
        return bytes(out), index
