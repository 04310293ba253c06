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


@functools.lru_cache(maxsize=None)
def _rev15() -> np.ndarray:
    """Bit-reversal permutation of 15-bit indices (host constant)."""
    t = np.arange(TABLE_SIZE, dtype=np.int64)
    r = np.zeros_like(t)
    for b in range(TABLE_BITS):
        r |= ((t >> b) & 1) << (TABLE_BITS - 1 - b)
    return r.astype(np.int32)


def build_tables_batch(lengths: jnp.ndarray, kinds: jnp.ndarray,
                       extras: jnp.ndarray, payloads: jnp.ndarray) -> jnp.ndarray:
    """Flat decode tables for a batch of trees at once.

    lengths: (B, n) i32 per-block code lengths; kinds/extras/payloads: (n,)
    shared per-symbol attributes. Returns (B * TABLE_SIZE,) u32 — block b's
    table occupies [b*TABLE_SIZE, (b+1)*TABLE_SIZE). Slots not covered by any
    code decode as invalid (kind 0) — foreign-stream validation relies on
    this (cf. inflator.c:454-474).

    Batched searchsorted is expressed as ONE flat searchsorted by placing each
    block's MSB-aligned interval starts in disjoint value ranges (b << 15 |
    start) — avoids TPU's slow batched-gather lowering.
    """
    B, n = lengths.shape
    l = lengths.astype(jnp.int32)
    codes = jax.vmap(lambda x: huffman.canonical_codes(x, C.MAX_CODE_BITS)[0])(l)
    used = l > 0
    # MSB-aligned interval starts, canonical order == ascending (len, code)
    key = jnp.where(used, (l << 16) | codes, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key, axis=1)                    # (B, n)
    bflat = (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
    order_f = (bflat + order).reshape(-1)
    l_s = l.reshape(-1)[order_f]
    used_s = used.reshape(-1)[order_f]
    codes_s = codes.reshape(-1)[order_f]
    start_s = jnp.where(used_s,
                        codes_s << jnp.clip(TABLE_BITS - l_s, 0, TABLE_BITS),
                        TABLE_SIZE)
    width_s = jnp.where(used_s, 1 << jnp.clip(TABLE_BITS - l_s, 0, TABLE_BITS), 0)
    blk = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n)
    flat_starts = blk * (TABLE_SIZE + 1) + start_s       # strictly segmented

    t_msb = jnp.asarray(_rev15())                        # (TABLE_SIZE,)
    qblk = jnp.repeat(jnp.arange(B, dtype=jnp.int32), TABLE_SIZE)
    q = qblk * (TABLE_SIZE + 1) + jnp.tile(t_msb, B)
    j = jnp.searchsorted(flat_starts, q, side="right").astype(jnp.int32) - 1
    jc = jnp.clip(j, 0, B * n - 1)
    same_blk = (jc // n) == qblk
    tq = jnp.tile(t_msb, B)
    covered = (j >= 0) & same_blk & (tq < start_s[jc] + width_s[jc])
    sym = (order_f[jc] - (jc // n) * n)
    entry = (l.reshape(-1)[order_f[jc]]
             | (kinds[sym] << 5)
             | (extras[sym] << 8)
             | (payloads[sym] << 16)).astype(jnp.uint32)
    return jnp.where(covered, entry, jnp.uint32(0))


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
    return (jnp.asarray(kinds), jnp.asarray(extras), jnp.asarray(payloads))


def dist_attrs():
    kinds = np.full(32, KIND_CODE, np.int32)
    kinds[30:] = KIND_INVALID      # reserved symbols: present in the fixed
    extras = np.zeros(32, np.int32)  # tree (completeness) but invalid on use
    payloads = np.zeros(32, np.int32)
    extras[:30] = C.DIST_EXTRA
    payloads[:30] = C.DIST_BASE
    return (jnp.asarray(kinds), jnp.asarray(extras), jnp.asarray(payloads))


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
    e1 = ltab[tb + extract_bits(words, p, TABLE_BITS).astype(jnp.int32)]
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
    e2 = dtab[tb + extract_bits(words, p2, TABLE_BITS).astype(jnp.int32)]
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
            sent(dist, 0), sent(flags, 0))


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
               rounds: int):
    """Resolve back-reference chains by pointer doubling.

    val: (N,) i32 output bytes (literal positions already set).
    src: (N,) i32 copy-source index per position (self for resolved).
    resolved: (N,) bool.
    """
    for _ in range(rounds):
        sv = val[src]
        sr = resolved[src]
        val = jnp.where(resolved, val, sv)
        nsrc = src[src]
        src = jnp.where(resolved, src, nsrc)
        resolved = resolved | sr
    return val, resolved
