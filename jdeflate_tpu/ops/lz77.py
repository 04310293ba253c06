"""LZ77 match finding and parse resolution, TPU-style.

Reference behavior reproduced (never translated): the deflator walks per-hash
linked chains (head/chain arrays, hash mult 0x1e35a7bd, src/deflator.c:32-70,
1930-1947), compares candidates word-at-a-time with a 258-byte cap
(getmatchlength, src/deflator.c:1977-2101), parses greedily for levels 1-5
(accept only len>3, compress1 src/deflator.c:2430-2520) and lazily for levels
6-9 with a one-position lookahead (compress2/getmatch2,
src/deflator.c:2605-2973).

TPU-first design (BASELINE.json north star): instead of pointer-chasing
chains, all positions are hashed in parallel and sorted by (hash, pos); the K
immediately-preceding same-hash positions are exactly the first K entries the
reference's chain walk would visit, but gatherable as a batch. The sequential
greedy/lazy cursor walk becomes a purely local decision rule plus an orbit
computation (pointer doubling over next[]), so the whole parse is O(log n)
parallel steps.

Performance-critical layout note: XLA-on-TPU lowers *batched* gathers (vmap
over a gather) orders of magnitude slower than flat 1-D gathers (measured
~400x on v5e). Everything here therefore operates on FLAT arrays over the
whole block batch — (B*L,) with explicit per-block base offsets — and probe
loops are `fori_loop`s to keep compile time bounded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C

HASH_MULT = np.uint32(0x1E35A7BD)   # cf. deflator.c:1946 (np, not jnp: eager
# device constants captured in traces force a d2h at lowering — see huffman._INF)
HASH_BITS = 15
MAX_EXT_STEPS = 16                   # 16 + 16*16 = 272 >= 258 byte cap


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for positive int32 <= 2^24 via f32 exponent bits."""
    f = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _words_le_flat(ext: jnp.ndarray, b: int, row: int) -> jnp.ndarray:
    """w[p] = 4 bytes at p as little-endian u32 over a flat (b*row,) buffer.

    Rows are independent blocks laid out contiguously; positions within the
    last 3 bytes of a row read into the next row, but valid accesses never go
    there (each row carries its own PAD tail).
    """
    e = ext.astype(jnp.uint32)
    n = e.shape[0]
    w = e
    w = w | jnp.concatenate([e[1:], jnp.zeros(1, jnp.uint32)]) << 8
    w = w | jnp.concatenate([e[2:], jnp.zeros(2, jnp.uint32)]) << 16
    w = w | jnp.concatenate([e[3:], jnp.zeros(3, jnp.uint32)]) << 24
    return w


def _lead_eq_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Number of leading (little-endian: low-order) equal bytes given XOR x."""
    b0 = (x & 0xFF) == 0
    b1 = (x & 0xFFFF) == 0
    b2 = (x & 0xFFFFFF) == 0
    return b0.astype(jnp.int32) + b1.astype(jnp.int32) + b2.astype(jnp.int32)


def _cmp16(w, a, b):
    """Exact common-prefix length of ext[a:] vs ext[b:] capped at 16 bytes.

    a, b: flat absolute indices (any shape, same shape)."""
    l = jnp.zeros(a.shape, jnp.int32)
    run = jnp.ones(a.shape, jnp.int32)
    first_x = jnp.zeros(a.shape, jnp.uint32)
    for t in range(4):
        wa = w[a + 4 * t]
        wb = w[b + 4 * t]
        eq = wa == wb
        x = wa ^ wb
        first_x = jnp.where((run == 1) & ~eq, x, first_x)
        stop_here = (run == 1) & ~eq
        l = l + jnp.where(run == 1, jnp.where(eq, 4, 0), 0)
        run = run * eq.astype(jnp.int32)
    return jnp.minimum(l + jnp.where(l < 16, _lead_eq_bytes(first_x), 0), 16)


def _extend(w, qi, cand, length):
    """Extend exact 16-byte-capped lengths to the 258-byte format cap."""
    def step(s, length):
        active = length == 16 * s
        add = _cmp16(w, qi + 16 * s, cand + 16 * s)
        return jnp.where(active, length + add, length)
    return jax.lax.fori_loop(1, MAX_EXT_STEPS + 1, step, length)


def _shift_right(a: jnp.ndarray, k: int, fill=0):
    """Row-wise shift towards higher column indices by k (axis 1)."""
    return jnp.pad(a[:, :-k], ((0, 0), (k, 0)), constant_values=fill)


def find_matches_batch(ext: jnp.ndarray, block_len: jnp.ndarray,
                       valid_from: jnp.ndarray, halo: int, bl: int, pad: int,
                       k: int, exact_ext: bool = True, ext_top: int = 8,
                       ext_rounds: int = 4, rescue: bool = False,
                       probe_words: int = 8, ext_mdiv: int = 16):
    """Best match per position for a whole batch of blocks at once.

    ext: (B, halo + bl + pad) u8 rows (halo history + block + zero pad).
    block_len, valid_from: (B,) i32.
    Returns (length, dist): (B, bl) i32.

    Zero-gather design (TPU: random access ~0.03 G elem/s, sorts and
    elementwise ~10-100x faster): the 16-byte prefix words are CO-SORTED with
    the (hash, pos) key, so the reference's chain walk becomes k row-wise
    SHIFTED compares over the sorted arrays — pure VPU work. Results return
    to position order with a second co-sort (position keys are a permutation,
    so the sorted layout IS position layout). Long matches extend by the
    link rule LCP(i,d) = 16 + LCP(i+16,d) when position i+16 selected the
    same distance — shifted selects, exact and never overstated (understates
    only when the neighbor chose a different candidate; measured ratio cost
    is negligible and bounded by the 32-byte prefix floor).
    """
    B = ext.shape[0]
    row = halo + bl + pad
    nh = halo + bl
    e32 = ext.astype(jnp.uint32)

    def wcol(off):
        c = e32[:, off:off + nh]
        c1 = e32[:, off + 1:off + 1 + nh]
        c2 = e32[:, off + 2:off + 2 + nh]
        c3 = e32[:, off + 3:off + 3 + nh]
        return c | (c1 << 8) | (c2 << 16) | (c3 << 24)

    # 32-byte probe prefixes: candidate SELECTION quality is bounded by the
    # compare width (a near candidate that matches 16 bytes must not shadow a
    # far one matching 80) — 8 co-sorted words cost little (the sort is ~3
    # ms/MB) and close most of the selection gap vs the reference's
    # full-length chain compares (getmatchlength, deflator.c:1977-2101).
    PW = probe_words
    sw = [wcol(4 * t) for t in range(PW)]
    h = (sw[0] * HASH_MULT) >> (32 - HASH_BITS)
    pos = jnp.broadcast_to(jnp.arange(nh, dtype=jnp.uint32)[None, :], (B, nh))
    key = (h << 17) | pos

    sorted_all = jax.lax.sort((key, *sw), dimension=1, num_keys=1)
    skey = sorted_all[0]
    sw = list(sorted_all[1:])
    spos = (skey & 0x1FFFF).astype(jnp.int32)
    shash = skey >> 17
    svfrom = valid_from[:, None]

    col = jnp.broadcast_to(jnp.arange(nh, dtype=jnp.int32)[None, :], (B, nh))
    best_len = jnp.zeros((B, nh), jnp.int32)
    best_dist = jnp.zeros((B, nh), jnp.int32)

    def probe(kk, carry):
        best_len, best_dist = carry
        # dynamic shift by kk: implemented as lax.dynamic_slice-style pad is
        # not available for traced kk; use a scan-free roll with column mask
        cpos = jnp.roll(spos, kk, axis=1)
        chash = jnp.roll(shash, kk, axis=1)
        dist = spos - cpos
        ok = (col >= kk) & (chash == shash) & (dist > 0) \
            & (dist <= C.WINDOW_SIZE) & (cpos >= svfrom)
        l = jnp.zeros((B, nh), jnp.int32)
        run = jnp.ones((B, nh), jnp.int32)
        firstx = jnp.zeros((B, nh), jnp.uint32)
        for t in range(PW):
            ct = jnp.roll(sw[t], kk, axis=1)
            eq = sw[t] == ct
            firstx = jnp.where((run == 1) & ~eq, sw[t] ^ ct, firstx)
            l = l + jnp.where(run == 1, jnp.where(eq, 4, 0), 0)
            run = run * eq.astype(jnp.int32)
        l32 = jnp.minimum(
            l + jnp.where(l < 4 * PW, _lead_eq_bytes(firstx), 0), 4 * PW)
        l32 = jnp.where(ok, l32, 0)
        better = l32 > best_len
        best_len = jnp.where(better, l32, best_len)
        best_dist = jnp.where(better, dist, best_dist)
        return best_len, best_dist

    best_len, best_dist = jax.lax.fori_loop(
        1, k + 1, probe, (best_len, best_dist))

    # back to position order: pos keys are a permutation of [0, nh), so the
    # sorted-by-pos layout is exactly position-indexed
    _, plen, pdist = jax.lax.sort(
        (spos.astype(jnp.uint32), best_len, best_dist),
        dimension=1, num_keys=1)

    if rescue:
        # 3-byte secondary rescue hash (levels >= 6): the reference probes a
        # QBITS=14 short-match table when the main 4-byte hash finds nothing
        # (deflator.c:49-70, 2676-2711), rejecting len-3 beyond offset 8192
        # (deflator.c:2829-2831). Batched analog: one extra (hash3, pos)
        # sort + 2 adjacent probes comparing the low 3 bytes.
        w0p = wcol(0)
        h3 = ((w0p & 0xFFFFFF) * HASH_MULT) >> (32 - 14)
        key3 = (h3 << 17) | pos
        sk3, s3w = jax.lax.sort((key3, w0p), dimension=1, num_keys=1)
        sp3 = (sk3 & 0x1FFFF).astype(jnp.int32)
        sh3 = sk3 >> 17
        r_len = jnp.zeros((B, nh), jnp.int32)
        r_dist = jnp.zeros((B, nh), jnp.int32)
        for kk in (1, 2):
            cp = jnp.roll(sp3, kk, axis=1)
            chh = jnp.roll(sh3, kk, axis=1)
            cw = jnp.roll(s3w, kk, axis=1)
            dist3 = sp3 - cp
            ok3 = (col >= kk) & (chh == sh3) & (dist3 > 0) \
                & (dist3 <= 8192) & (cp >= svfrom) \
                & (((s3w ^ cw) & 0xFFFFFF) == 0) & (r_len == 0)
            r_len = jnp.where(ok3, 3, r_len)
            r_dist = jnp.where(ok3, dist3, r_dist)
        _, r_len, r_dist = jax.lax.sort(
            (sp3.astype(jnp.uint32), r_len, r_dist), dimension=1, num_keys=1)
        use3 = (plen < C.MIN_MATCH) & (r_len == 3)
        plen = jnp.where(use3, 3, plen)
        pdist = jnp.where(use3, r_dist, pdist)

    # link extension: LCP(i,d) = s + LCP(i+s,d) when dist matches (shifted
    # selects; exact, never overstated). Chains double 16->32->64->128->258.
    def ext_round(shift, length, dist):
        nlen = jnp.pad(length[:, shift:], ((0, 0), (0, shift)))
        ndist = jnp.pad(dist[:, shift:], ((0, 0), (0, shift)))
        linked = (length == shift) & (ndist == dist)
        return jnp.where(linked, shift + nlen, length)

    for shift in (16, 32, 64, 128):
        plen = ext_round(shift, plen, pdist)
    # 256 -> 258 top-up via the same link at 256
    n256l = jnp.pad(plen[:, 256:], ((0, 0), (0, 256)))
    n256d = jnp.pad(pdist[:, 256:], ((0, 0), (0, 256)))
    plen = jnp.where((plen == 256) & (n256d == pdist) & (n256l >= 2),
                     258, plen)

    # exact top-up for lengths the link rule left at a 16-byte boundary (the
    # neighbor chose a different candidate). This restores getmatchlength
    # exactness (deflator.c:1977-2101) without per-probe 258-byte compares.
    if not exact_ext:
        length = plen[:, halo:]
        dist = pdist[:, halo:]
        bpos = jnp.arange(bl, dtype=jnp.int32)[None, :]
        length = jnp.minimum(jnp.minimum(length, C.MAX_MATCH),
                             block_len[:, None] - bpos)
        length = jnp.where(length >= C.MIN_MATCH, length, 0)
        dist = jnp.where(length > 0, dist, 0)
        return length, dist
    # Stage 1 — top-T distances, gather-free (repetitive data leaves ~half
    # of all positions boundary-capped, far too many for a compacted gather
    # pass; but their distances concentrate on a few values: RLE periods,
    # record strides). For each of the T most stuck-mass distances d, the
    # suffix run length of eq[j] = (ext[j] == ext[j-d]) IS the exact LCP at
    # every position whose match distance is d — computed for all positions
    # at once with one shift-compare and one reverse cummin per d.
    T = ext_top     # stuck-mass coverage plateaus at ~72% by top-8 (measured)
    pl2 = plen
    pd2 = pdist
    stuck0 = (pl2 > 0) & (pl2 % 16 == 0) & (pl2 < 258)
    dwt = jnp.where(stuck0, pd2, 0)
    # subsampled histogram: the top distances are frequent by definition, so
    # a 1-in-4 sample finds them; the full-size scatter-add cost ~11 ms/MB
    # on v5e (scatters run ~0.14 G elem/s)
    dws = dwt.reshape(-1)[::4]
    hist = jnp.zeros(C.WINDOW_SIZE + 1, jnp.int32).at[
        dws].add(1, mode="drop").at[0].set(0)
    topd = jax.lax.top_k(hist, T)[1].astype(jnp.int32)
    col_row = jnp.arange(row, dtype=jnp.int32)[None, :]
    BIG = np.int32(1 << 20)
    for t in range(T):
        d = topd[t]
        eq = (ext == jnp.roll(ext, d, axis=1)) & (col_row >= d)
        nz = jnp.where(eq, BIG, col_row)
        nnm = jnp.flip(jax.lax.cummin(jnp.flip(nz, 1), axis=1), 1)
        runlen = jnp.minimum(nnm, row) - col_row
        runlen = jnp.minimum(runlen[:, :nh], C.MAX_MATCH)
        sel = (pd2 == d) & (pl2 > 0)
        pl2 = jnp.where(sel, runlen, pl2)
    plen = pl2

    # Stage 2 — compacted gather-compare rounds for the residue (distances
    # outside the top T), early-exiting when no boundary survivors remain.
    # Overflowed slots keep the link-rule length — bounded ratio cost only.
    wflat = _words_le_flat(ext.reshape(-1), B, row)
    N = B * nh
    M = max(N // ext_mdiv, 1024)
    pl = plen.reshape(-1)
    pd = pdist.reshape(-1)
    # halo columns' lengths are discarded by the final [:, halo:] slice;
    # excluding them keeps compaction slots for positions actually emitted
    fidx = jnp.arange(N, dtype=jnp.int32)
    in_block = (fidx % nh) >= halo
    stuck = (pl > 0) & (pl % 16 == 0) & (pl < 258) & in_block
    # compaction by sort (a full-size scatter here cost ~11 ms/MB; the
    # bitonic sort of N i32 keys runs ~3 ms)
    sidx = jax.lax.sort(jnp.where(stuck, fidx, np.int32(-1) - fidx))[-M:]
    valid = sidx >= 0
    si = jnp.maximum(sidx, 0)
    qi_s = si + (si // nh) * pad          # flat (B, nh) index -> flat row index
    cand_s = qi_s - pd[si]
    l0 = jnp.where(valid, pl[si], 0)

    # ext_rounds * 16 bytes of residual extension: the top-T stage already
    # took the long-run mass (RLE periods, record strides), so the residue's
    # true extensions are short; the cap bounds the gather bill at rounds*M*8
    # (higher levels spend more, cf. the reference's chain table).
    def ext_cond(c):
        r, l = c
        return (r < ext_rounds) & jnp.any(
            (l > 0) & (l % 16 == 0) & (l < 258))

    def ext_body(c):
        r, l = c
        active = (l > 0) & (l % 16 == 0) & (l < 258)
        add = _cmp16(wflat, qi_s + l, cand_s + l)
        return r + 1, jnp.where(active, l + add, l)

    _, lext_ = jax.lax.while_loop(ext_cond, ext_body, (jnp.int32(0), l0))
    pl = pl.at[jnp.where(valid, si, N)].set(
        jnp.minimum(lext_, C.MAX_MATCH), mode="drop")
    plen = pl.reshape(B, nh)

    length = plen[:, halo:]
    dist = pdist[:, halo:]
    bpos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    length = jnp.minimum(jnp.minimum(length, C.MAX_MATCH),
                         block_len[:, None] - bpos)
    length = jnp.where(length >= C.MIN_MATCH, length, 0)
    dist = jnp.where(length > 0, dist, 0)
    return length, dist


# Length-symbol extra-bit count per match length (index by length, 0..258).
_LEN_EXTRA_BY_LEN = np.zeros(259, np.int32)
for _l in range(3, 259):
    _LEN_EXTRA_BY_LEN[_l] = C.LENGTH_EXTRA[C.LENGTH_TO_SYMBOL[_l - 3] - 257]


def _match_cost_bits(length, dist):
    """Approximate emitted bits for a match token: ~7-bit length code +
    length extra + ~6-bit distance code + distance extra (log2(d)-2).

    Length extra bits computed arithmetically (RFC 1951 symbol geometry:
    floor(log2(len-3)) - 2 for len-3 >= 8, 0 otherwise, 0 for 258) — a
    259-entry LUT gather here cost ~7 ms per 1 MB batch on v5e."""
    n_ = jnp.maximum(length - 3, 0)
    lex = jnp.where((n_ < 8) | (length >= 258), 0,
                    jnp.maximum(_floor_log2(jnp.maximum(n_, 1)) - 2, 0))
    dex = jnp.maximum(_floor_log2(jnp.maximum(dist, 1)) - 2, 0)
    return 13 + lex + dex


def parse_take(length: jnp.ndarray, dist: jnp.ndarray, block_len: jnp.ndarray,
               lazy: bool, good_length: int) -> jnp.ndarray:
    """Per-position candidate rule: would the sequential parser accept a match
    here if it arrives? (greedy: len>3, compress1 deflator.c:2476; lazy:
    compress2's lookahead heuristics, deflator.c:2829-2906, with the
    documented cost-aware deferral deviation). Pure local decision — the
    sequential walk only reads it, so the walk can run in match space."""
    B = length.shape[0]
    if not lazy:
        return length > C.MIN_MATCH
    # len-3 acceptance: the reference rejects offset > 8192
    # (deflator.c:2829-2831); with entropy-coded literals at ~5-6 bits a
    # len-3 match only pays for itself when the distance extra bits are
    # small — measured cutoff d <= 256 compresses better at every level
    ok = (length >= C.MIN_MATCH) & ~((length == C.MIN_MATCH) & (dist > 256))
    ln = jnp.concatenate([length[:, 1:], jnp.zeros((B, 1), jnp.int32)], 1)
    dn = jnp.concatenate([dist[:, 1:], jnp.ones((B, 1), jnp.int32)], 1)
    ok_n = (ln >= C.MIN_MATCH) & ~((ln == C.MIN_MATCH) & (dn > 256))
    defer = ok_n & (
        (8 + _match_cost_bits(ln, dn)) * length <
        _match_cost_bits(length, dist) * (1 + ln))
    return ok & ((length >= good_length) | ~defer)


def _make_walk_kernel(rows_per_block: int):
    def _walk_kernel(cnext_hbm, length_hbm, blen_ref, out_ref, csm, lsm,
                     osm, sem_c, sem_l, sem_o):
        return _walk_body(cnext_hbm, length_hbm, blen_ref, out_ref, csm,
                          lsm, osm, sem_c, sem_l, sem_o, rows_per_block)
    return _walk_kernel


def _walk_body(cnext_hbm, length_hbm, blen_ref, out_ref, csm, lsm,
               osm, sem_c, sem_l, sem_o, rows_per_block):
    """Sequential match-to-match walk, one block per grid step (Pallas, TPU).

    The reference's parse cursor (compress1/compress2 loop,
    src/deflator.c:2430-2973) visits every position; here literal runs are
    skipped entirely via cnext (next accepted-candidate at/or-after), so the
    loop runs once per EMITTED MATCH (<= bl/3 worst case, ~3k typical for a
    64 KiB block). cnext/length stream through SMEM in chunks (scalar loads
    run ~10 ns vs ~50 cycles for roll + vreg->sreg extracts — the round-2
    version cost ~27 ms/MB); emitted match positions pack compactly into an
    SMEM list (p | len<<17) DMA'd out, and the caller scatters the marks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CH = _WALK_CHUNK
    b = pl.program_id(0)
    blen = blen_ref[b]

    def fetch(p):
        c0 = pl.multiple_of((p // CH) * (CH // 128), CH // 128)
        cp1 = pltpu.make_async_copy(
            cnext_hbm.at[pl.ds(b * rows_per_block + c0, CH // 128), :],
            csm, sem_c)
        cp1.start()
        cp2 = pltpu.make_async_copy(
            length_hbm.at[pl.ds(b * rows_per_block + c0, CH // 128), :],
            lsm, sem_l)
        cp2.start()
        cp1.wait()
        cp2.wait()
        return (p // CH) * CH

    def cond(c):
        p, k, c0 = c
        return p < blen

    def body(c):
        p, k, c0 = c
        c0 = jax.lax.cond(p - c0 >= CH, lambda: fetch(p), lambda: c0)
        q = p - c0
        ln = lsm[q >> 7, q & 127]
        osm[k >> 7, k & 127] = p | (ln << 17)
        e = p + ln
        c0 = jax.lax.cond(e - c0 >= CH, lambda: fetch(e), lambda: c0)
        qe = e - c0
        return csm[qe >> 7, qe & 127], k + 1, c0

    c00 = fetch(0)
    q0 = csm[0, 0]
    p, k, _ = jax.lax.while_loop(cond, body, (q0, jnp.int32(1), c00))
    osm[0, 0] = k                 # slot 0 = count + 1
    cp_o = pltpu.make_async_copy(
        osm, out_ref.at[pl.ds(b * _WALK_OROWS, _WALK_OROWS), :], sem_o)
    cp_o.start()
    cp_o.wait()


_WALK_CHUNK = 4096                # positions per SMEM chunk (16 KiB x2)
_WALK_OROWS = 176                 # output rows per block (8-aligned; 176*128
                                  # slots >= bl/3 worst-case match count)


def token_marks_batch(length: jnp.ndarray, take: jnp.ndarray,
                      block_len: jnp.ndarray, bl: int):
    """Token flags for the whole batch: (is_tok, is_match), each (B, bl).

    is_match marks the match tokens the sequential greedy/lazy cursor would
    emit; is_tok additionally marks every literal position not covered by an
    emitted match. Exact — identical to walking next[] = p + (take ? len : 1)
    from 0 — but runs once per match, not once per position.

    TPU: Pallas sequential walk per block (grid over blocks). Other backends
    (CPU tests): dense pointer-doubling fallback.
    """
    B = length.shape[0]
    pos = jnp.arange(bl, dtype=jnp.int32)[None, :]
    cand_pos = jnp.where(take & (pos < block_len[:, None]), pos, bl)
    # next candidate at-or-after p: reverse cummin, absorbing bl
    cnext = jnp.flip(jax.lax.cummin(jnp.flip(cand_pos, 1), axis=1), 1)
    padn = (-(bl + 1)) % 128 + 1
    cnextp = jnp.concatenate(
        [cnext, jnp.full((B, padn), bl, jnp.int32)], 1)          # (B, bl+padn)
    lenp = jnp.concatenate(
        [jnp.maximum(length, 1), jnp.full((B, padn), 1, jnp.int32)], 1)

    if jax.default_backend() == "cpu":
        nxt = jnp.where(take, length, 1)
        nxt = jnp.minimum(pos + nxt, bl)
        nxt = jnp.where(pos < block_len[:, None], nxt, bl)
        nxt = jnp.concatenate([nxt, jnp.full((B, 1), bl, jnp.int32)], 1)
        base = (jnp.arange(B, dtype=jnp.int32) * (bl + 1))[:, None]
        p = orbit_batch((nxt + base).reshape(-1), B, bl)
        tb = base
        tok_flat = jnp.zeros(B * (bl + 1), jnp.int32).at[
            (tb + jnp.minimum(p, bl)).reshape(-1)].set(1)
        is_tok = (tok_flat.reshape(B, bl + 1)[:, :bl] > 0) \
            & (pos < block_len[:, None])
        return is_tok, is_tok & take

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    CH = _WALK_CHUNK
    # pad the position axis so any chunk DMA stays in bounds
    n = -(-(bl + padn) // CH) * CH + CH
    extra = n - (bl + padn)
    if extra:
        cnextp = jnp.pad(cnextp, ((0, 0), (0, extra)), constant_values=bl)
        lenp = jnp.pad(lenp, ((0, 0), (0, extra)), constant_values=1)
    W = n // 128
    assert _WALK_OROWS * 128 >= bl // 3 + 128, "match-list capacity"
    cap = _WALK_OROWS * 128
    plist = pl.pallas_call(
        _make_walk_kernel(W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B * _WALK_OROWS, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((CH // 128, 128), jnp.int32),
            pltpu.SMEM((CH // 128, 128), jnp.int32),
            pltpu.SMEM((_WALK_OROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cnextp.reshape(B * W, 128), lenp.reshape(B * W, 128), block_len)
    plist = plist.reshape(B, cap)
    # scatter the compact match lists back to position marks
    cnt = jnp.maximum(plist[:, 0] - 1, 0)                      # per block
    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
    livem = (slot >= 1) & (slot < plist[:, :1] )
    mp = jnp.where(livem, plist & 0x1FFFF, bl)
    mlen = jnp.where(livem, plist >> 17, 0)
    bb = (jnp.arange(B, dtype=jnp.int32) * (bl + 1))[:, None]
    flat_ms = jnp.zeros(B * (bl + 1), jnp.int32).at[
        (bb + jnp.minimum(mp, bl)).reshape(-1)].add(
        livem.astype(jnp.int32).reshape(-1), mode="drop")
    flat_me = jnp.zeros(B * (bl + 1), jnp.int32).at[
        (bb + jnp.minimum(mp + mlen, bl)).reshape(-1)].add(
        livem.astype(jnp.int32).reshape(-1), mode="drop")
    ms = flat_ms.reshape(B, bl + 1)[:, :bl]
    me = flat_me.reshape(B, bl + 1)[:, :bl]
    active = jnp.cumsum(ms - me, axis=1)
    is_match = ms > 0
    live = pos < block_len[:, None]
    is_tok = (is_match | (active <= 0)) & live
    return is_tok, is_match & live


def parse_batch(length: jnp.ndarray, dist: jnp.ndarray, block_len: jnp.ndarray,
                bl: int, lazy: bool, good_length: int):
    """Local greedy/lazy decision -> flat next[] with per-block sentinels.

    Greedy (levels 1-5) accepts only len>3 (compress1, deflator.c:2476);
    lazy (levels 6-9) keeps compress2's structure — one-position lookahead,
    immediate accept at good_length, len-3/far rejection
    (deflator.c:2829-2831) — but the deferral predicate is cost-aware: defer
    iff literal+next-match encodes its covered bytes in fewer bits/byte.
    Measured against the compiled reference this is strictly better (the
    reference relies on weakened re-search while pending to break deferral
    cascades, which has no parallel analog).

    length/dist: (B, bl). Returns (next_flat (B*(bl+1),), take (B, bl)):
    block b's positions live at [b*(bl+1), b*(bl+1)+bl] with an absorbing
    sentinel at local index bl.
    """
    B = length.shape[0]
    take = parse_take(length, dist, block_len, lazy, good_length)
    step = jnp.where(take, length, 1)
    i = jnp.arange(bl, dtype=jnp.int32)[None, :]
    nxt = jnp.minimum(i + step, bl)
    nxt = jnp.where(i < block_len[:, None], nxt, bl)
    nxt = jnp.concatenate([nxt, jnp.full((B, 1), bl, jnp.int32)], 1)
    base = (jnp.arange(B, dtype=jnp.int32) * (bl + 1))[:, None]
    return (nxt + base).reshape(-1), take


def orbit_batch(next_flat: jnp.ndarray, B: int, bl: int) -> jnp.ndarray:
    """P[b, m] = next^m(start_b) for every block via flat pointer doubling.

    next_flat: (B*(bl+1),) absolute indices with absorbing per-block
    sentinels. Returns (B, bl) orbit positions (LOCAL within block).
    """
    starts = jnp.arange(B, dtype=jnp.int32) * (bl + 1)
    p = starts[:, None]
    j = next_flat
    while p.shape[1] < bl:
        p = jnp.concatenate([p, j[p.reshape(-1)].reshape(p.shape)], axis=1)
        if p.shape[1] < bl:
            j = j[j]
    p = p[:, :bl]
    base = (jnp.arange(B, dtype=jnp.int32) * (bl + 1))[:, None]
    return p - base                      # local positions, bl == sentinel
