"""Window-parallel DEFLATE symbol walk (the decode-side hot kernel).

Reference behavior reproduced (never translated): the inflator's fast decode
loop — two-level canonical Huffman lookup, length/distance base+extra
recovery, end-of-block and validity handling (decodefast,
/root/reference/src/inflator.c:1529-1823; buildtable validity matrix
:380-568).

TPU-first design (round 3): the stream is cut on a fixed 32-bit WINDOW GRID
aligned to u32 word boundaries. The encoder (or the native indexer) records,
for every 32-bit window of a block's symbol span, the bit offset of the first
symbol starting in that window — exact entry points, no speculation. Each
window is one decode LANE:

  * lane words are CONTIGUOUS and word-aligned, so lane bit-buffers are plain
    reshapes/shifts of the stream — zero gathers to stage;
  * a lane decodes at most 32 symbols (a symbol costs >= 1 bit), so the slot
    dimension is a static 32 with no overflow path;
  * a symbol spans at most 48 bits (15+5+15+13), so three consecutive words
    cover any symbol starting in the window — no refill loop.

Huffman decode is table-free "canonical arithmetic" form: 15-bit MSB-aligned
code window -> code length by binary search over per-tree interval limits ->
symbol by rank into a (length, symbol)-sorted array. All per-tree state packs
into four 128-lane rows, matching the one Mosaic gather primitive that is
fast on this chip (per-lane take_along_axis within a 128-wide row, measured
~55 G lookups/s vs ~0.14 G elem/s for XLA HBM gathers — scripts/jobs/3x).

Two interchangeable implementations of one contract:
  * walk_ref   — pure jnp (any backend; the correctness referee, and the
                 CPU-test path);
  * walk_tpu   — Pallas kernel (the production path on TPU).

Table packing (i32, per tree):
  T1 row: [0:15]  litlen limt[l]  (l = col+1; (first+cnt)<<(15-l), 15-bit axis)
          [16:31] litlen first|base<<16
          [32:47] dist limt
          [48:63] dist first|base<<16
          [64:94] dist sorted symbols
          [94:124] dist attr: base | extra<<16
  T2a/T2b: litlen sorted symbols [0:128)/[128:256)
  T2c row: [0:32]  litlen sorted symbols [256:288)
           [32:61] length attr for lsym 257..285: base | extra<<12
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C

K_BITS = 32          # window grid pitch (bits) == one u32 word
S_SLOTS = 32         # max symbols starting in one window (>= K_BITS / 1)
ROWS_PER_TILE = 64   # lane rows per kernel grid step (8192 lanes)
PE_LANES = 1024      # lanes per pseudo-entry (uniform vmapped slicing)
PE_ROWS = PE_LANES // 128

TOK_LIT = 1          # tok kind codes (bits 30:32)
TOK_MATCH = 2


def _attr_tables():
    """Static length/dist attribute rows (np; folded as constants)."""
    lattr = (C.LENGTH_BASE | (C.LENGTH_EXTRA << 12)).astype(np.int32)   # (29,)
    dattr = (C.DIST_BASE | (C.DIST_EXTRA << 16)).astype(np.int32)       # (30,)
    return lattr, dattr


def _tree_rows(lengths: jnp.ndarray, nsym: int):
    """(limt[15], firstbase[15], sorted_syms[nsym]) for ONE tree (vmapped).

    Canonical interval math per RFC 1951 §3.2.2 (cf. setuptable,
    /root/reference/src/deflator.c:1188-1285): limt[l] = (first[l]+cnt[l])
    << (15-l) on the 15-bit MSB-aligned code axis; a decoded window c has
    length l = 1 + #{j: c >= limt[j]}; symbol = sorted_syms[base[l] +
    (c >> (15-l)) - first[l]]. Oversubscribed trees (Kraft > 1) make limt
    wrap past 2^15 and decode as invalid; incomplete trees leave c >= limt[15]
    slots invalid (matches buildtable's validity rules, inflator.c:454-474).
    """
    l = lengths.astype(jnp.int32)
    used = l > 0
    cnt = jnp.zeros(16, jnp.int32).at[jnp.clip(l, 0, 15)].add(
        used.astype(jnp.int32)).at[0].set(0)
    limt = jnp.zeros(15, jnp.int32)
    fb = jnp.zeros(15, jnp.int32)
    code = jnp.int32(0)
    base = jnp.int32(0)
    for lb in range(1, 16):                       # static unroll
        code = (code + cnt[lb - 1]) << 1
        lim = jnp.minimum((code + cnt[lb]) << (15 - lb), 1 << 15)
        limt = limt.at[lb - 1].set(lim)
        fb = fb.at[lb - 1].set(code | (base << 16))
        base = base + cnt[lb]
    sym = jnp.arange(lengths.shape[0], dtype=jnp.int32)
    key = jnp.where(used, (l << 10) | sym, np.int32(1 << 20))
    order = jnp.argsort(key)
    ssym = jnp.where(jnp.sort(key) < (1 << 20), order.astype(jnp.int32), 0)
    pad = nsym - lengths.shape[0]
    if pad > 0:
        ssym = jnp.concatenate([ssym, jnp.zeros(pad, jnp.int32)])
    return limt, fb, ssym[:nsym]


def build_entry_tables(ll: jnp.ndarray, dl: jnp.ndarray):
    """(E, 288) litlen + (E, 32) dist code lengths -> T1, T2a, T2b, T2c
    each (E, 128) i32 (layout in the module docstring)."""
    lattr, dattr = _attr_tables()

    def one(llen, dlen):
        llim, lfb, lsym = _tree_rows(llen, 288)
        dlim, dfb, dsym = _tree_rows(dlen, 32)
        t1 = jnp.zeros(128, jnp.int32)
        t1 = t1.at[0:15].set(llim).at[16:31].set(lfb)
        t1 = t1.at[32:47].set(dlim).at[48:63].set(dfb)
        t1 = t1.at[64:94].set(dsym[:30])
        t1 = t1.at[94:124].set(jnp.asarray(dattr))
        t2a = lsym[0:128]
        t2b = lsym[128:256]
        t2c = jnp.zeros(128, jnp.int32)
        t2c = t2c.at[0:32].set(lsym[256:288])
        t2c = t2c.at[32:61].set(jnp.asarray(lattr))
        return t1, t2a, t2b, t2c

    return jax.vmap(one)(ll, dl)


def _rev15(x):
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x >> 1


def _field(s0, s1, s2, o, n):
    """n-bit LSB-first field at bit offset o (any shape; o + n <= 96).

    o < 64 always holds for code reads (o <= 51); only extra-bit reads can
    push o past 64, and their fields end <= 96, so the two-word funnel with
    a clamped high word is exact."""
    o = o.astype(jnp.uint32)
    a = jnp.where(o < 32, s0, jnp.where(o < 64, s1, s2))
    b = jnp.where(o < 32, s1, jnp.where(o < 64, s2, jnp.uint32(0)))
    oo = o & 31
    lo = (a >> oo) | jnp.where(oo == 0, 0, b << (jnp.uint32(32) - oo))
    if isinstance(n, int):
        return lo & jnp.uint32((1 << n) - 1)
    return lo & ((jnp.uint32(1) << n.astype(jnp.uint32)) - 1)


def _decode_step(s0, s1, s2, pos, t1g, t2g, active):
    """Decode ONE symbol per lane at bit pos (relative to lane word 0).

    t1g(idx) / t2g(kind, idx) are gather callables supplied by the caller
    (lane-gather in the kernel, flat gather in the reference impl).
    Returns (tok u32, nbits i32, outlen i32, err bool, eob bool)."""
    c15 = _rev15(_field(s0, s1, s2, pos, 15).astype(jnp.int32))
    # code length by binary search over limt (4 gathers)
    k = jnp.zeros_like(pos)
    for step in (8, 4, 2, 1):
        kk = k + step
        t = t1g(jnp.minimum(kk - 1, 14))
        k = jnp.where((kk <= 15) & (c15 >= t), kk, k)
    bad = k >= 15
    l = jnp.minimum(k + 1, 15)
    fb = t1g(16 + jnp.minimum(k, 14))
    first = fb & 0xFFFF
    sidx = (fb >> 16) + (c15 >> (15 - l)) - first
    sidx = jnp.clip(sidx, 0, 287)
    sym = jnp.where(sidx < 128, t2g(0, sidx),
                    jnp.where(sidx < 256, t2g(1, sidx - 128),
                              t2g(2, jnp.minimum(sidx - 256, 31))))
    is_eob = ~bad & (sym == C.EOB)
    is_lit = ~bad & (sym < 256)
    is_len = ~bad & (sym > 256)

    lsym = jnp.clip(sym - 257, 0, 28)
    lat = t2g(2, 32 + lsym)
    lext = lat >> 12
    o2 = pos + l
    lval = _field(s0, s1, s2, o2, lext).astype(jnp.int32)
    length = (lat & 0xFFF) + lval
    bad = bad | (is_len & (sym > 285))
    o3 = o2 + jnp.where(is_len, lext, 0)

    # distance (masked for non-matches; garbage reads are harmless)
    c15d = _rev15(_field(s0, s1, s2, o3, 15).astype(jnp.int32))
    kd = jnp.zeros_like(pos)
    for step in (8, 4, 2, 1):
        kk = kd + step
        t = t1g(32 + jnp.minimum(kk - 1, 14))
        kd = jnp.where((kk <= 15) & (c15d >= t), kk, kd)
    badd = kd >= 15
    ld = jnp.minimum(kd + 1, 15)
    dfb = t1g(48 + jnp.minimum(kd, 14))
    didx = (dfb >> 16) + (c15d >> (15 - ld)) - (dfb & 0xFFFF)
    didx = jnp.clip(didx, 0, 29)
    dsym = t1g(64 + didx)
    dat = t1g(94 + jnp.clip(dsym, 0, 29))
    dext = dat >> 16
    o4 = o3 + ld
    dval = _field(s0, s1, s2, o4, dext).astype(jnp.int32)
    dist = (dat & 0xFFFF) + dval
    bad = bad | (is_len & (badd | (dsym > 29)))

    nbits = jnp.where(is_len, l + lext + ld + dext, l)
    lit_tok = jnp.uint32(TOK_LIT << 30) | sym.astype(jnp.uint32)
    m_tok = (np.uint32(TOK_MATCH << 30) | length.astype(jnp.uint32)
             | ((dist - 1).astype(jnp.uint32) << 9))
    tok = jnp.where(is_lit, lit_tok, jnp.where(is_len, m_tok, jnp.uint32(0)))
    outlen = jnp.where(is_lit, 1, jnp.where(is_len, length, 0))
    err = active & bad
    tok = jnp.where(active & ~bad, tok, 0)
    outlen = jnp.where(active & ~bad, outlen, 0)
    return tok, nbits, outlen, err, is_eob


def walk_ref(seg0, seg1, seg2, start_rel, t1, t2a, t2b, t2c):
    """Reference implementation on flat (L,) lanes (any backend).

    seg0/1/2: (L,) u32 — lane words w, w+1, w+2.
    start_rel: (L,) i32 first-symbol bit within the lane word (< 32); < 0
      marks an inactive (padding) lane.
    t1/t2a/t2b/t2c: (ceil(L/128), 128) i32 per-ROW table rows (all 128 lanes
    of a row share one tree — same contract as the kernel's tile operands).
    Returns (tok (S, L) u32, outlen (L,), count (L,), err (L,) bool).
    """
    L = seg0.shape[0]
    lane = jnp.arange(L, dtype=jnp.int32)
    rowbase = (lane >> 7) * 128
    t1f = t1.reshape(-1)
    t2f = [t2a.reshape(-1), t2b.reshape(-1), t2c.reshape(-1)]

    def t1g(idx):
        return t1f[rowbase + idx]

    def t2g(kind, idx):
        return t2f[kind][rowbase + idx]

    def step(carry, _):
        pos, active, outlen, cnt, err, eobf = carry
        tok, nbits, ol, e, eob = _decode_step(
            seg0, seg1, seg2, jnp.maximum(pos, 0), t1g, t2g, active)
        pos2 = pos + jnp.where(active, nbits, 0)
        outlen = outlen + ol
        cnt = cnt + (active & ~eob & ~e).astype(jnp.int32)
        err = err | e
        eobf = eobf | (active & eob)
        active = active & ~eob & ~e & (pos2 < K_BITS)
        return (pos2, active, outlen, cnt, err, eobf), tok

    active0 = (start_rel >= 0) & (start_rel < K_BITS)
    init = (jnp.where(active0, start_rel, 0), active0,
            jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
            jnp.zeros(L, jnp.bool_), jnp.zeros(L, jnp.bool_))
    (pos, active, outlen, cnt, err, eobf), toks = jax.lax.scan(
        step, init, None, length=S_SLOTS)
    # a lane still active after S_SLOTS steps decoded a sub-1-bit symbol
    # stream — impossible; treat as error
    return toks, outlen, cnt, err | active, pos, eobf


def _walk_kernel(t1_ref, t2a_ref, t2b_ref, t2c_ref, seg0_ref, seg1_ref,
                 seg2_ref, start_ref, tok_ref, meta_ref):
    """Pallas walk kernel: one grid step = ROWS_PER_TILE lane rows."""
    from jax.experimental import pallas as pl

    R = ROWS_PER_TILE
    t1 = t1_ref[:, :]
    t2 = [t2a_ref[:, :], t2b_ref[:, :], t2c_ref[:, :]]
    s0 = seg0_ref[:, :].astype(jnp.uint32)
    s1 = seg1_ref[:, :].astype(jnp.uint32)
    s2 = seg2_ref[:, :].astype(jnp.uint32)
    start = start_ref[:, :]

    def t1g(idx):
        return jnp.take_along_axis(t1, idx, axis=1)

    def t2g(kind, idx):
        return jnp.take_along_axis(t2[kind], idx, axis=1)

    tok_ref[:, :] = jnp.zeros(tok_ref.shape, tok_ref.dtype)

    active0 = (start >= 0) & (start < K_BITS)

    # Mosaic cannot carry i1 vectors through scf.while — masks ride as i32
    def cond(c):
        s, pos, active, outlen, cnt, err, eobf = c
        return (s < S_SLOTS) & (jnp.max(active) > 0)

    def body(c):
        s, pos, active, outlen, cnt, err, eobf = c
        act = active > 0
        tok, nbits, ol, e, eob = _decode_step(
            s0, s1, s2, jnp.maximum(pos, 0), t1g, t2g, act)
        tok_ref[pl.ds(s * R, R), :] = tok
        pos2 = pos + jnp.where(act, nbits, 0)
        outlen = outlen + ol
        cnt = cnt + (act & ~eob & ~e).astype(jnp.int32)
        err = err | e.astype(jnp.int32)
        eobf = eobf | (act & eob).astype(jnp.int32)
        active = (act & ~eob & ~e & (pos2 < K_BITS)).astype(jnp.int32)
        return s + 1, pos2, active, outlen, cnt, err, eobf

    z = jnp.zeros((R, 128), jnp.int32)
    init = (jnp.int32(0), jnp.where(active0, start, 0),
            active0.astype(jnp.int32), z, z, z, z)
    s, pos, active, outlen, cnt, err, eobf = jax.lax.while_loop(
        cond, body, init)
    # meta pack: outlen[0:15] | cnt[15:21] | err[21] | eob[22] | posf[23:31]
    meta_ref[:, :] = (outlen | (cnt << 15)
                      | ((err | active) << 21)
                      | (eobf << 22)
                      | (jnp.clip(pos, 0, 255) << 23))


@functools.partial(jax.jit, static_argnames=("nrows",))
def walk_tpu(seg0, seg1, seg2, start_rel, t1, t2a, t2b, t2c, nrows: int):
    """Production walk: inputs shaped (nrows, 128) (nrows % ROWS_PER_TILE
    == 0). Returns (tok (G*S*R, 128) u32 slot-major, meta (nrows, 128))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = ROWS_PER_TILE
    G = nrows // R
    rows = pl.BlockSpec((R, 128), lambda g: (g, 0), memory_space=pltpu.VMEM)
    tok_spec = pl.BlockSpec((S_SLOTS * R, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    tok, meta = pl.pallas_call(
        _walk_kernel,
        grid=(G,),
        in_specs=[rows] * 8,
        out_specs=[tok_spec, rows],
        out_shape=[jax.ShapeDtypeStruct((G * S_SLOTS * R, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((nrows, 128), jnp.int32)],
    )(t1, t2a, t2b, t2c, seg0.astype(jnp.uint32), seg1.astype(jnp.uint32),
      seg2.astype(jnp.uint32), start_rel)
    return tok, meta


def tok_to_lane_major(tok: jnp.ndarray, nrows: int) -> jnp.ndarray:
    """(G*S*R, 128) slot-major kernel output -> (L, S) lane-major."""
    R = ROWS_PER_TILE
    G = nrows // R
    t = tok.reshape(G, S_SLOTS, R, 128)
    return jnp.transpose(t, (0, 2, 3, 1)).reshape(nrows * 128, S_SLOTS)


def ref_tok_to_lane_major(toks: jnp.ndarray) -> jnp.ndarray:
    """walk_ref's (S, L) stack -> (L, S)."""
    return jnp.transpose(toks, (1, 0))


def annotate_lit_runs(tok_lm: jnp.ndarray) -> jnp.ndarray:
    """Write the literal-run length into bits [8:14] of each run's FIRST
    literal slot (a run = consecutive TOK_LIT slots within a lane). The
    expand kernel then copies whole runs instead of single bytes."""
    S = tok_lm.shape[1]
    kind = (tok_lm >> 30).astype(jnp.int32)
    is_lit = kind == TOK_LIT
    # run length ending at each slot, scanning right-to-left
    run = jnp.zeros_like(tok_lm, dtype=jnp.int32)
    acc = jnp.zeros(tok_lm.shape[0], jnp.int32)
    cols = []
    for s in range(S - 1, -1, -1):                # static unroll (S = 32)
        acc = jnp.where(is_lit[:, s], acc + 1, 0)
        cols.append(acc)
    run = jnp.stack(cols[::-1], axis=1)
    prev_lit = jnp.pad(is_lit[:, :-1], ((0, 0), (1, 0)))
    start = is_lit & ~prev_lit
    return jnp.where(start, tok_lm | (run.astype(jnp.uint32) << 8), tok_lm)
