"""Block-parallel DEFLATE encoder: one jitted pipeline over a batch of blocks.

Architecture (TPU-first; see SURVEY.md §7): the unit of work is a batch of
fixed-size blocks with static shapes, not a resumable byte stream. Each batch
runs: parallel hash + sorted-bucket candidate probes -> vectorized match
extension -> local greedy/lazy decision -> pointer-doubling parse orbit ->
per-block symbol frequencies -> batched Huffman build -> precode RLE ->
per-item (value, nbits) -> one global exclusive scan + scatter-add bitstream
pack. Blocks inside a batch are bit-contiguous, exactly like the reference's
multi-block streams; batch seams are joined with byte-aligned sync-flush
blocks (the reference's DEFLT_FLUSH framing, src/deflator.c:609-654), which
double as checkpoint/shard seams (SURVEY.md §5).

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

# Precode RLE extra-bit counts per symbol (16 -> 2, 17 -> 3, 18 -> 7).
_P_EXTRA = np.zeros(19, np.int32)
_P_EXTRA[16:19] = (2, 3, 7)


def _rle_runs(comb: jnp.ndarray) -> jnp.ndarray:
    """r[j] = number of equal values at and after j within the current run."""
    n = comb.shape[0]

    def step(carry, j):
        r_next, v_next = carry
        v = comb[j]
        r = jnp.where(v == v_next, r_next + 1, 1)
        return (r, v), r

    (_, _), rs = jax.lax.scan(
        step, (jnp.int32(0), _SENT), jnp.arange(n - 1, -1, -1, dtype=jnp.int32))
    return rs[::-1]


def _rle_emit(comb: jnp.ndarray):
    """Forward scan producing per-position precode RLE symbols.

    Returns (sym, extra, emit): (n,) each; emit marks positions that output a
    symbol; absorbed positions emit nothing.
    """
    n = comb.shape[0]
    runs = _rle_runs(comb)
    idx = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.asarray([-1], jnp.int32), comb[:-1]])
    is_start = comb != prev

    def step(skip, j):
        v = comb[j]
        r = runs[j]
        start = is_start[j]
        live = (skip == 0) & (v != _SENT)

        # zero runs: 17 (3-10), 18 (11-138), literals below 3; leave >=3 rest
        zr_unit = jnp.where(r < 3, 1,
                   jnp.where(r <= 138, r,
                    jnp.where(r - 138 >= 3, 138, r - 3)))
        z_sym = jnp.where(zr_unit < 3, 0, jnp.where(zr_unit <= 10, 17, 18))
        z_extra = jnp.where(z_sym == 17, zr_unit - 3,
                   jnp.where(z_sym == 18, zr_unit - 11, 0))

        # nonzero: literal at run start; rep16 (3-6) afterwards with leave-3
        nz_rep = ~start & (r >= 3)
        nz_unit = jnp.where(~nz_rep, 1,
                   jnp.where(r <= 6, r, jnp.where(r - 6 >= 3, 6, r - 3)))
        nz_sym = jnp.where(nz_rep, 16, v)
        nz_extra = jnp.where(nz_rep, nz_unit - 3, 0)

        zero = v == 0
        unit = jnp.where(zero, jnp.where(z_sym == 0, 1, zr_unit), nz_unit)
        sym = jnp.where(zero, z_sym, nz_sym)
        extra = jnp.where(zero, z_extra, nz_extra)

        out = (jnp.where(live, sym, 0), jnp.where(live, extra, 0), live)
        skip = jnp.where(live, unit - 1, jnp.maximum(skip - 1, 0))
        return skip, out

    _, (sym, extra, emit) = jax.lax.scan(step, jnp.int32(0), idx)
    return sym, extra, emit


def _block_entropy(lfreq, dfreq, block_len, cfg: levels_mod.LevelConfig):
    """Per-block entropy stage (vmapped; all arrays are tiny): dynamic trees,
    precode RLE, header items, exact static-vs-dynamic cost decision.

    Returns (hdr_lo, hdr_nb (HDR_ITEMS,), el, er (286,), edl, edr (30,),
    eob_lo, eob_nb) — emission tables already select dynamic vs fixed codes.
    """
    lext_bits = jnp.concatenate(
        [jnp.zeros(257, jnp.int32), jnp.asarray(C.LENGTH_EXTRA)])
    dext_bits = jnp.asarray(C.DIST_EXTRA)

    # dynamic trees
    dl = huffman.code_lengths(lfreq, C.MAX_CODE_BITS)
    _, dlr = huffman.canonical_codes(dl, C.MAX_CODE_BITS)
    dd = huffman.code_lengths(dfreq, C.MAX_CODE_BITS)
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
    pl = huffman.code_lengths(pfreq, C.MAX_PRECODE_BITS)
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
    use_dyn = dyn_cost < stat_cost

    # emission tables (per-block select dynamic vs fixed)
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
    live = block_len > 0
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
    return hdr_lo, hdr_nb, el, er, edl, edr, eob_lo, eob_nb


def encode_batch_impl(data: jnp.ndarray, start_block: jnp.ndarray,
                      total_len: jnp.ndarray, dict_len: jnp.ndarray,
                      final_block: jnp.ndarray,
                      bl: int, batch: int, level: int, num_words: int):
    """Encode `batch` consecutive blocks of `data` into one bit-contiguous
    DEFLATE fragment.

    data: (HALO + N_padded + PAD,) u8 — input with a HALO-byte history prefix
      (zeros or preset dictionary, cf. deflator_setdctnr deflator.c:2106-2167)
      and PAD trailing zeros.
    start_block: scalar i32 — index of the first block to encode.
    total_len: scalar i32 — true input length (bytes).
    dict_len: scalar i32 — preset dictionary bytes available to block 0.
    final_block: scalar i32 — global index of the stream's last block (gets
      BFINAL, cf. endstream deflator.c:609-654).

    Returns (words u32[num_words], total_bits, block_bits (batch,), ntok).
    """
    cfg = levels_mod.get_level(level)
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
    B = batch
    length, dist = lz77.find_matches_batch(
        ext, block_len, valid_from, HALO, bl, PAD, max(cfg.probes, 1),
        cfg.rerank)
    take = lz77.parse_take(length, dist, block_len, cfg.lazy, cfg.good_length)
    # sequential-parse equivalent via the match-space walk (Pallas on TPU):
    # runs once per emitted match, not once per position
    is_tok, t_take = lz77.token_marks_batch(length, take, block_len, bl)
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

    # frequencies (two flat scatter-adds across the whole batch)
    vi = is_tok.astype(jnp.int32)
    lb = (jnp.arange(B, dtype=jnp.int32) * C.NUM_LITLEN_USED)[:, None]
    lfreq = jnp.zeros(B * C.NUM_LITLEN_USED, jnp.int32).at[
        (lb + jnp.where(is_tok, lsym, 0)).reshape(-1)].add(
        vi.reshape(-1)).reshape(B, C.NUM_LITLEN_USED)
    lfreq = lfreq.at[:, C.EOB].add((block_len > 0).astype(jnp.int32))
    mt = (t_take & is_tok).astype(jnp.int32)
    db = (jnp.arange(B, dtype=jnp.int32) * C.NUM_DIST_USED)[:, None]
    dfreq = jnp.zeros(B * C.NUM_DIST_USED, jnp.int32).at[
        (db + jnp.where(t_take, dsym, 0)).reshape(-1)].add(
        mt.reshape(-1)).reshape(B, C.NUM_DIST_USED)

    hdr_lo, hdr_nb, el, er, edl, edr, eob_lo, eob_nb = jax.vmap(
        lambda lf, df, n: _block_entropy(lf, df, n, cfg)
    )(lfreq, dfreq, block_len)
    hdr_lo = hdr_lo.at[:, 0].set(
        hdr_lo[:, 0] | bfinal.astype(jnp.uint32))

    # two packed code lookups per position: litlen (codes<<4|len) and dist
    lpack = (er << 4) | el.astype(jnp.uint32)          # (B, 286)
    dpack = (edr << 4) | edl.astype(jnp.uint32)        # (B, 30)
    le = lpack.reshape(-1)[(lb + lsym).reshape(-1)].reshape(B, bl)
    de = dpack.reshape(-1)[(db + dsym).reshape(-1)].reshape(B, bl)
    lcode = le >> 4
    llen = (le & 15).astype(jnp.int32)
    dcode = de >> 4
    dlen = (de & 15).astype(jnp.int32)

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

    nitems = HDR_ITEMS + bl + 1
    lo = jnp.zeros((B, nitems), jnp.uint32)
    hi = jnp.zeros((B, nitems), jnp.uint32)
    nb = jnp.zeros((B, nitems), jnp.int32)
    lo = lo.at[:, :HDR_ITEMS].set(hdr_lo)
    nb = nb.at[:, :HDR_ITEMS].set(hdr_nb)
    lo = lo.at[:, HDR_ITEMS:HDR_ITEMS + bl].set(jnp.where(tv_n > 0, tv_lo, 0))
    hi = hi.at[:, HDR_ITEMS:HDR_ITEMS + bl].set(jnp.where(tv_n > 0, tv_hi, 0))
    nb = nb.at[:, HDR_ITEMS:HDR_ITEMS + bl].set(tv_n)
    lo = lo.at[:, -1].set(eob_lo)
    nb = nb.at[:, -1].set(eob_nb)
    ntok = jnp.sum(vi)

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

    # stored item arrays, then per-block select
    lennlen1 = (len1 | ((len1 ^ 0xFFFF) << 16)).astype(jnp.uint32)
    lennlen2 = (len2 | ((len2 ^ 0xFFFF) << 16)).astype(jnp.uint32)
    has2 = len2 > 0
    s_lo = jnp.zeros_like(lo)
    s_hi = jnp.zeros_like(hi)
    s_nb = jnp.zeros_like(nb)
    hdr_v = jnp.where(has2, 0, bfinal).astype(jnp.uint32)
    s_lo = s_lo.at[:, 0].set(hdr_v)
    s_nb = s_nb.at[:, 0].set(jnp.where(block_len > 0, 3, 0))
    p_lo, p_hi, p_n = bitpack.append_bits(
        jnp.zeros_like(lennlen1), jnp.zeros_like(lennlen1),
        pad_bits.astype(jnp.int32), lennlen1, jnp.int32(32))
    s_lo = s_lo.at[:, 1].set(p_lo)
    s_hi = s_hi.at[:, 1].set(p_hi)
    s_nb = s_nb.at[:, 1].set(jnp.where(block_len > 0, p_n, 0))
    # byte slots: j<len1 -> byte j; j==len1 (if split) -> hdr2+LEN2 item;
    # len1<j<=len -> byte j-1
    jidx = jnp.arange(bl + 1, dtype=jnp.int32)[None, :]          # (1, bl+1)
    blk_bytes = ext[:, HALO:HALO + bl].astype(jnp.uint32)
    byte_lo = jnp.concatenate([blk_bytes, jnp.zeros((batch, 1), jnp.uint32)], 1)
    shift_lo = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.uint32), blk_bytes], 1)       # byte j-1
    is_b1 = jidx < len1[:, None]
    is_h2 = has2[:, None] & (jidx == len1[:, None])
    is_b2 = has2[:, None] & (jidx > len1[:, None]) & (jidx <= block_len[:, None])
    h2_v = (bfinal.astype(jnp.uint32) | (lennlen2 << 8))
    h2_hi = (lennlen2 >> 24)
    tok_lo = jnp.where(is_b1, byte_lo,
              jnp.where(is_h2, h2_v[:, None],
               jnp.where(is_b2, shift_lo, 0))).astype(jnp.uint32)
    tok_hi = jnp.where(is_h2, h2_hi[:, None], 0).astype(jnp.uint32)
    tok_nb = jnp.where(is_b1 | is_b2, 8, jnp.where(is_h2, 40, 0))
    s_lo = s_lo.at[:, HDR_ITEMS:].set(tok_lo)
    s_hi = s_hi.at[:, HDR_ITEMS:].set(tok_hi)
    s_nb = s_nb.at[:, HDR_ITEMS:].set(tok_nb)

    sel = use_stored[:, None]
    lo = jnp.where(sel, s_lo, lo)
    hi = jnp.where(sel, s_hi, hi)
    nb = jnp.where(sel, s_nb, nb)

    words, offs, total = bitpack.pack(
        lo.reshape(-1), hi.reshape(-1), nb.reshape(-1), num_words)
    per_block_bits = jnp.sum(nb, axis=1)

    # symbol anchors for exact parallel decode: the pack scan knows every
    # item's bit offset, so record every 64th symbol's position per block
    # (~0.1% index overhead; decode then needs no speculation at all)
    offs2 = offs.reshape(B, nitems)[:, HDR_ITEMS:]
    sym_nb = nb[:, HDR_ITEMS:]
    sym_mask = sym_nb > 0
    ordinal = jnp.cumsum(sym_mask.astype(jnp.int32), axis=1)
    sel = sym_mask & (ordinal % 64 == 1) & (ordinal > 1)
    amax = (nitems - HDR_ITEMS) // 64 + 2
    aslot = (ordinal - 1) // 64 - 1
    ab = (jnp.arange(B, dtype=jnp.int32) * amax)[:, None]
    anchors = jnp.full(B * amax, -1, jnp.int32).at[
        jnp.where(sel, ab + aslot, B * amax)].set(
        offs2, mode="drop").reshape(B, amax)
    nsyms = ordinal[:, -1]
    return (words, total, per_block_bits, jnp.sum(ntok), anchors, nsyms,
            use_stored)


encode_batch = jax.jit(
    encode_batch_impl, static_argnames=("bl", "batch", "level", "num_words"))


@functools.partial(jax.jit, static_argnames=("bl", "batch", "level",
                                             "num_words"))
def encode_batch_packed(data, start_block, total_len, dict_len, final_block,
                        bl: int, batch: int, level: int, num_words: int):
    """encode_batch + all small outputs packed into ONE i32 array.

    The axon backend drops a process into synchronous per-dispatch mode after
    its first device->host read, so drivers dispatch every batch first and
    read back once per batch afterwards; packing shrinks that to two reads
    (words + meta) per batch. meta = [total, ntok, per_block(batch),
    nsyms(batch), stored(batch), anchors(batch*amax)].
    """
    words, total, per_block, ntok, anchors, nsyms, stored = encode_batch_impl(
        data, start_block, total_len, dict_len, final_block,
        bl, batch, level, num_words)
    meta = jnp.concatenate([
        total[None] if total.ndim else jnp.reshape(total, (1,)),
        jnp.reshape(ntok, (1,)),
        per_block.astype(jnp.int32),
        nsyms.astype(jnp.int32),
        stored.astype(jnp.int32),
        anchors.reshape(-1).astype(jnp.int32),
    ])
    return words, meta


def words_bound(bl: int, batch: int) -> int:
    """Static output-word bound: <=11 bits/byte (len-3 far match worst case
    under static codes) plus per-block header slack."""
    return (batch * (11 * bl + 8192)) // 32 + 4


class RawDeflater:
    """Host-side driver producing a complete raw DEFLATE stream (RFC 1951).

    Batches of blocks are encoded on device; batch seams are byte-aligned with
    sync-flush empty stored blocks (zlib Z_SYNC_FLUSH semantics, cf.
    deflator.h:135-141). Returns the byte stream plus a block index enabling
    parallel decode.
    """

    def __init__(self, level: int = 6, block_size: int = 1 << 16,
                 batch: int = 16):
        self.level = level
        self.bl = block_size
        self.batch = batch

    def compress(self, data: bytes, dictionary: bytes | None = None,
                 final: bool = True):
        """Compress to a raw DEFLATE stream.

        final=False omits BFINAL and terminates with a byte-aligned
        sync-flush seam instead (Z_SYNC_FLUSH / DEFLT_FLUSH semantics,
        deflator.h:135-141), so further segments can be concatenated.
        """
        bl, batch = self.bl, self.batch
        n = len(data)
        if n == 0:
            if not final:
                return b"", {"block_bits": [], "block_bytes": [],
                             "sync_points": [], "n": 0, "anchors": []}
            # empty stream: single static block with just EOB = 0x03 0x00
            return b"\x03\x00", {"block_bits": [], "block_bytes": [],
                                 "sync_points": [], "n": 0, "anchors": []}
        dict_bytes = (dictionary or b"")[-C.WINDOW_SIZE:]
        nblocks = (n + bl - 1) // bl
        arr = np.frombuffer(data, np.uint8)

        # Fixed-shape segments: one compiled program regardless of input size.
        # Each device call sees exactly (HALO + batch*bl + PAD) bytes; the
        # segment's halo is the preceding 32 KiB of the stream (or the preset
        # dictionary for the first segment).
        seg = batch * bl
        nw = words_bound(bl, batch)
        out = bytearray()
        index_bits = []          # absolute bit offset of each block start
        index_bytes = []         # output (uncompressed) offset of each block
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
            handles.append((b0, encode_batch_packed(
                dev, jnp.int32(0), jnp.int32(seg_n), jnp.int32(h),
                jnp.int32(final_idx - b0), bl, batch, self.level, nw)))

        # Phase 2: read back and assemble
        amax = ((HDR_ITEMS + bl + 1) - HDR_ITEMS) // 64 + 2
        for b0, (words, meta) in handles:
            m = np.asarray(meta)
            total = int(m[0])
            pb = m[2:2 + batch]
            stored_h = m[2 + 2 * batch:2 + 3 * batch]
            anc = m[2 + 3 * batch:].reshape(batch, amax)
            wb = np.asarray(words).view(np.uint8)  # little-endian words
            base_bits = len(out) * 8
            acc = 0
            for i in range(min(batch, nblocks - b0)):
                index_bits.append(base_bits + acc)
                index_bytes.append((b0 + i) * bl)
                if stored_h[i]:
                    anchors_out.append(None)
                else:
                    a = anc[i]
                    anchors_out.append(
                        (base_bits + a[a >= 0]).astype(np.int64))
                acc += int(pb[i])
            if b0 + batch >= nblocks and final:
                out += wb[: (total + 7) // 8].tobytes()
            else:
                # sync flush: 3 zero bits (BFINAL=0, BTYPE=00) + pad + 00 00 ff ff
                out += wb[: (total + 3 + 7) // 8].tobytes()
                out += b"\x00\x00\xff\xff"
                sync_points.append(len(out))
        index = {"block_bits": index_bits, "block_bytes": index_bytes,
                 "sync_points": sync_points, "n": n,
                 "anchors": anchors_out}
        return bytes(out), index
