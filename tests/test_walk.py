"""Unit tests for the window-parallel symbol walk (ops/walk.py).

Validates the canonical-arithmetic decode math of walk_ref against streams
produced by zlib (foreign) across data profiles, by reconstructing the output
from the emitted token slots.
"""
import zlib

import numpy as np
import pytest

from jdeflate_tpu.ops import walk
from jdeflate_tpu.stream import host_inflate as hi


def _expand_tokens(toks_lm, counts, dictionary=b""):
    """Sequential reconstruction from lane-major tokens (test referee)."""
    out = bytearray(dictionary)
    for l in range(toks_lm.shape[0]):
        for s in range(int(counts[l])):
            t = int(toks_lm[l, s])
            kind = t >> 30
            if kind == walk.TOK_LIT:
                out.append(t & 0xFF)
            elif kind == walk.TOK_MATCH:
                ln = t & 0x1FF
                d = ((t >> 9) & 0x7FFF) + 1
                for _ in range(ln):
                    out.append(out[-d])
    return bytes(out[len(dictionary):])


def _walk_block(raw, rec, prev_out):
    import jax.numpy as jnp
    ll = np.zeros(288, np.int32)
    ll[:len(rec.litlen_lengths)] = rec.litlen_lengths
    dl = np.zeros(32, np.int32)
    dl[:len(rec.dist_lengths)] = rec.dist_lengths
    t1, t2a, t2b, t2c = walk.build_entry_tables(
        jnp.asarray(ll[None, :]), jnp.asarray(dl[None, :]))

    anchors = rec.win_anchors
    grid0 = rec.sym_bit_offset & ~31
    w0 = grid0 >> 5
    L = len(anchors)
    pad = raw + b"\x00" * 16
    words = np.frombuffer(pad[: (len(pad) // 4) * 4], np.uint8).view("<u4")
    seg0 = np.zeros(L, np.uint32)
    seg1 = np.zeros(L, np.uint32)
    seg2 = np.zeros(L, np.uint32)
    for j in range(L):
        seg0[j] = words[w0 + j]
        seg1[j] = words[w0 + j + 1]
        seg2[j] = words[w0 + j + 2]
    start_rel = np.where(anchors >= 0,
                         anchors - (np.int64(w0) + np.arange(L)) * 32,
                         -1).astype(np.int32)
    assert ((start_rel < 32) | (anchors < 0)).all()

    R = -(-L // 128)
    t1r = jnp.broadcast_to(t1, (R, 128))
    t2ar = jnp.broadcast_to(t2a, (R, 128))
    t2br = jnp.broadcast_to(t2b, (R, 128))
    t2cr = jnp.broadcast_to(t2c, (R, 128))
    toks, outlen, cnt, err, posf, eobf = walk.walk_ref(
        jnp.asarray(seg0), jnp.asarray(seg1), jnp.asarray(seg2),
        jnp.asarray(start_rel), t1r, t2ar, t2br, t2cr)
    assert not bool(np.asarray(err).any()), "walk flagged errors"
    assert bool(np.asarray(eobf).any()), "no lane decoded the EOB"
    toks_lm = np.asarray(walk.ref_tok_to_lane_major(toks))
    return _expand_tokens(toks_lm, np.asarray(cnt), prev_out)


def _roundtrip(data, level):
    raw = zlib.compress(data, level)[2:-4]
    out, recs, _ = hi.inflate_raw(raw)
    assert out == data
    got = b""
    hist = b""
    for rec in recs:
        if rec.btype == 0:
            start = rec.sym_bit_offset >> 3
            piece = raw[start:start + rec.out_len]
        else:
            piece = _walk_block(raw, rec, hist[-32768:])
        got += piece
        hist = (hist + piece)[-32768:]
    assert got == data


@pytest.mark.parametrize("kind", ["text", "runs", "random", "binary"])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_walk_ref_zlib(corpus, kind, level):
    data = corpus(kind, 1 << 16)
    _roundtrip(data, level)


def test_walk_ref_tiny(corpus):
    for n in (1, 2, 7, 63, 64, 65):
        _roundtrip(corpus("text", n), 6)


def test_walk_ref_static_block():
    # level 0 strategy-fixed: zlib with strategy Z_FIXED emits static codes
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 8, zlib.Z_FIXED)
    data = b"hello hello hello world " * 200
    raw = co.compress(data) + co.flush()
    out, recs, _ = hi.inflate_raw(raw)
    assert out == data
    got = b""
    for rec in recs:
        assert rec.btype in (1, 2)
        got += _walk_block(raw, rec, got[-32768:])
    assert got == data


def test_annotate_lit_runs():
    import jax.numpy as jnp
    L1 = walk.TOK_LIT << 30
    M = walk.TOK_MATCH << 30
    tok = jnp.asarray(np.array(
        [[L1 | 5, L1 | 6, M | 3, L1 | 7, 0, 0, 0, 0] + [0] * 24],
        np.uint32))
    ann = np.asarray(walk.annotate_lit_runs(tok))
    assert (ann[0, 0] >> 8) & 0x3F == 2
    assert (ann[0, 1] >> 8) & 0x3F == 0
    assert (ann[0, 3] >> 8) & 0x3F == 1
