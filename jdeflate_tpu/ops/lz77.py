"""LZ77 match finding and parse resolution, TPU-style.

Reference behavior reproduced (never translated): the deflator walks per-hash
linked chains (head/chain arrays, hash mult 0x1e35a7bd, src/deflator.c:32-70,
1930-1947), compares candidates word-at-a-time with a 258-byte cap
(getmatchlength, src/deflator.c:1977-2101), parses greedily for levels 1-5
(accept only len>3, compress1 src/deflator.c:2430-2520) and lazily for levels
6-9 with a one-position lookahead and the acceptance heuristic
`diff>4 || 4*diff + log2(prev_off) - log2(new_off) >= 2`, a good-length
immediate-accept, and rejection of len-3 matches with offset>8192
(compress2/getmatch2, src/deflator.c:2605-2973).

TPU-first design (BASELINE.json north star): instead of pointer-chasing
chains, all positions are hashed in parallel and sorted by (hash, pos); the K
immediately-preceding same-hash positions are exactly the first K entries the
reference's chain walk would visit, but gatherable as a batch. Match lengths
are vectorized 4-byte word compares with an unrolled 16-byte-step extension.
The sequential greedy/lazy cursor walk becomes a purely local decision rule
plus an orbit computation (pointer doubling over next[]), so the whole parse
is O(log n) parallel steps. Everything vmaps over a batch of blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C

HASH_MULT = jnp.uint32(0x1E35A7BD)   # cf. deflator.c:1946
HASH_BITS = 15
MAX_EXT_STEPS = 16                   # 16 + 16*16 = 272 >= 258 byte cap


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for positive int32 <= 2^24 via f32 exponent bits."""
    f = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _words_le(ext: jnp.ndarray) -> jnp.ndarray:
    """w[p] = 4 bytes at p as a little-endian u32, defined for p < len-3."""
    e = ext.astype(jnp.uint32)
    return e[:-3] | (e[1:-2] << 8) | (e[2:-1] << 16) | (e[3:] << 24)


def _lead_eq_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Number of leading (little-endian: low-order) equal bytes given XOR x."""
    b0 = (x & 0xFF) == 0
    b1 = (x & 0xFFFF) == 0
    b2 = (x & 0xFFFFFF) == 0
    return b0.astype(jnp.int32) + b1.astype(jnp.int32) + b2.astype(jnp.int32)


def _cmp16(w, a, b):
    """Exact common-prefix length of ext[a:] vs ext[b:] capped at 16 bytes."""
    wa = jnp.stack([w[a], w[a + 4], w[a + 8], w[a + 12]])
    wb = jnp.stack([w[b], w[b + 4], w[b + 8], w[b + 12]])
    eq = wa == wb
    run = eq[0].astype(jnp.int32)
    m4 = run
    for t in range(1, 4):
        run = run * eq[t].astype(jnp.int32)
        m4 = m4 + run
    mi = jnp.minimum(m4, 3)
    x = jnp.take_along_axis(wa, mi[None, :], axis=0)[0] ^ \
        jnp.take_along_axis(wb, mi[None, :], axis=0)[0]
    return jnp.where(m4 >= 4, 16, 4 * m4 + _lead_eq_bytes(x))


def _extend(w, qi, cand, length):
    """Extend exact 16-byte-capped lengths to the 258-byte format cap."""
    for s in range(1, MAX_EXT_STEPS + 1):
        active = length == 16 * s
        add = _cmp16(w, qi + 16 * s, cand + 16 * s)
        length = jnp.where(active, length + add, length)
    return length


def find_matches(ext: jnp.ndarray, block_len: jnp.ndarray, valid_from: jnp.ndarray,
                 halo: int, bl: int, k: int, rerank: int = 0):
    """Best match per block position.

    ext: (halo + bl + pad,) u8 — halo bytes of history, bl block bytes, zero pad
      (pad >= MAX_MATCH + 8).
    block_len: scalar i32, true block length (<= bl).
    valid_from: scalar i32, first ext position usable as history (halo minus
      available dictionary/previous-block bytes).
    k: static chain depth (number of hash-bucket candidates probed).
    rerank: frontier re-ranking rounds — after extending the capped winner,
      re-probe candidates that also match at the current frontier and extend
      the closest such candidate exactly; recovers long matches the 16-byte
      ranking cap under-scored (record-structured data).

    Returns (length, dist): (bl,) i32 each; length==0 where no match.
    vmap over blocks.
    """
    nh = halo + bl                       # hashed positions
    pos = jnp.arange(nh, dtype=jnp.int32)
    w = _words_le(ext)

    h = ((w[:nh] * HASH_MULT) >> (32 - HASH_BITS)).astype(jnp.uint32)
    # positions at/after block_len hold pad garbage; their pos is larger than
    # any query, so they can never be selected as a *previous* occurrence.
    key = (h << 17) | pos.astype(jnp.uint32)
    order = jnp.argsort(key)             # sorted by (hash, pos)
    rank = jnp.zeros(nh, jnp.int32).at[order].set(pos)
    sorted_pos = order.astype(jnp.int32)
    sorted_hash = h[order]

    qi = halo + jnp.arange(bl, dtype=jnp.int32)    # query positions in ext
    qrank = rank[qi]
    qhash = h[qi]

    best_len = jnp.zeros(bl, jnp.int32)
    best_cand = jnp.zeros(bl, jnp.int32)
    cands = []
    capped = []
    for kk in range(1, k + 1):
        j = qrank - kk
        jc = jnp.maximum(j, 0)
        cand = sorted_pos[jc]
        ok = (j >= 0) & (sorted_hash[jc] == qhash) & (cand >= valid_from) \
            & (qi - cand <= C.WINDOW_SIZE)
        l16 = jnp.where(ok, _cmp16(w, qi, cand), 0)
        better = l16 > best_len           # ties keep earlier k == closer cand
        best_len = jnp.where(better, l16, best_len)
        best_cand = jnp.where(better, cand, best_cand)
        if rerank > 0:
            cands.append(cand)
            capped.append(l16 == 16)

    length = _extend(w, qi, best_cand, best_len)

    for _ in range(rerank):
        # Probe each 16-capped candidate at the current frontier word; the
        # closest one still matching there is exactly re-extended (always
        # sound: extension yields true lengths, so `length` only improves).
        fo = jnp.maximum(length - 3, 0)
        sel = jnp.full((bl,), -1, jnp.int32)
        for kk in range(k):
            inplay = capped[kk] & (cands[kk] != best_cand) & \
                (w[qi + fo] == w[cands[kk] + fo])
            sel = jnp.where((sel < 0) & inplay, cands[kk], sel)
        has = (sel >= 0) & (length < C.MAX_MATCH)
        sc = jnp.maximum(sel, 0)
        nl = _extend(w, qi, sc, jnp.where(has, _cmp16(w, qi, sc), 0))
        better = has & (nl > length)
        length = jnp.where(better, nl, length)
        best_cand = jnp.where(better, sc, best_cand)

    # Clamp to format cap and to block end (tokens never cross blocks).
    bpos = jnp.arange(bl, dtype=jnp.int32)
    length = jnp.minimum(length, C.MAX_MATCH)
    length = jnp.minimum(length, block_len - bpos)
    length = jnp.where(length >= C.MIN_MATCH, length, 0)
    dist = jnp.where(length > 0, qi - best_cand, 0)
    return length, dist


# Length-symbol extra-bit count per match length (index by length, 0..258).
_LEN_EXTRA_BY_LEN = np.zeros(259, np.int32)
for _l in range(3, 259):
    _LEN_EXTRA_BY_LEN[_l] = C.LENGTH_EXTRA[C.LENGTH_TO_SYMBOL[_l - 3] - 257]


def _match_cost_bits(length, dist):
    """Approximate emitted bits for a match token: ~7-bit length code +
    length extra + ~6-bit distance code + distance extra (log2(d)-2)."""
    lex = jnp.asarray(_LEN_EXTRA_BY_LEN)
    dex = jnp.maximum(_floor_log2(jnp.maximum(dist, 1)) - 2, 0)
    return 13 + lex[jnp.clip(length, 0, 258)] + dex


def parse(length: jnp.ndarray, dist: jnp.ndarray, block_len: jnp.ndarray,
          bl: int, lazy: bool, good_length: int):
    """Local greedy/lazy decision -> next[] step array.

    Greedy (levels 1-5) accepts only len>3, matching compress1
    (deflator.c:2476). Lazy (levels 6-9) reproduces compress2's structure —
    one-position lookahead, immediate accept at good_length, len-3/far
    rejection (deflator.c:2829-2831) — but the deferral predicate is
    cost-aware instead of the reference's `diff>4 || 4diff+log2 >= 2`
    heuristic: defer iff the literal+next-match option encodes its covered
    bytes in fewer bits/byte than taking the current match. Measured against
    the compiled reference this is strictly better (the reference relies on
    weakened re-search while pending to break deferral cascades, which has no
    parallel analog).

    Returns (next_, take): next_ (bl+1,) i32 with absorbing sentinel at bl;
    take (bl,) bool — whether a token starting at i would be a match.
    """
    if not lazy:
        take = length > C.MIN_MATCH          # greedy accepts only len>3
    else:
        ok = (length >= C.MIN_MATCH) & ~((length == C.MIN_MATCH) & (dist > 8192))
        ln = jnp.concatenate([length[1:], jnp.zeros(1, jnp.int32)])
        dn = jnp.concatenate([dist[1:], jnp.ones(1, jnp.int32)])
        ok_n = (ln >= C.MIN_MATCH) & ~((ln == C.MIN_MATCH) & (dn > 8192))
        # defer iff rate(literal + next match) < rate(current match)
        defer = ok_n & (
            (8 + _match_cost_bits(ln, dn)) * length <
            _match_cost_bits(length, dist) * (1 + ln))
        take = ok & ((length >= good_length) | ~defer)
    step = jnp.where(take, length, 1)
    i = jnp.arange(bl, dtype=jnp.int32)
    nxt = jnp.minimum(i + step, bl)
    nxt = jnp.where(i < block_len, nxt, bl)     # out-of-range -> sentinel
    nxt = jnp.concatenate([nxt, jnp.asarray([bl], jnp.int32)])
    return nxt, take


def orbit(next_: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """P[m] = next^m(0): the token start positions, via pointer doubling.

    next_ must have an absorbing fixed point at its last index. Returns
    (max_len,) i32. vmap over blocks.
    """
    j = next_
    p = jnp.zeros((1,), jnp.int32)
    while p.shape[0] < max_len:
        p = jnp.concatenate([p, j[p]])
        if p.shape[0] < max_len:
            j = j[j]
    return p[:max_len]
