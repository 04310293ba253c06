"""Decoder tests: device wavefront path + host referee + validity matrix
(SURVEY.md §4 items 2-3)."""
import zlib

import numpy as np
import pytest

from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.stream import host_inflate as hi
from jdeflate_tpu.utils import errors


@pytest.fixture(scope="module")
def dec():
    return RawInflater()


@pytest.mark.parametrize("kind", ["text", "runs", "random", "zeros", "binary"])
def test_device_roundtrip(corpus, dec, kind):
    data = corpus(kind, 20000)
    raw, idx = RawDeflater(level=6, block_size=4096, batch=2).compress(data)
    assert dec.decompress(raw, index=idx) == data


@pytest.mark.parametrize("level", [0, 1, 9])
def test_device_roundtrip_levels(corpus, dec, level):
    data = corpus("text", 12000)
    raw, idx = RawDeflater(level=level, block_size=4096, batch=2).compress(data)
    assert dec.decompress(raw, index=idx) == data


def test_device_with_dictionary(corpus, dec):
    dict_ = corpus("text", 5000)
    data = dict_[:2000] + corpus("text", 3000)
    raw, idx = RawDeflater(level=6, block_size=4096, batch=1).compress(
        data, dictionary=dict_)
    assert dec.decompress(raw, index=idx, dictionary=dict_) == data


def test_foreign_stream_host(corpus, dec):
    data = corpus("text", 30000)
    z = zlib.compress(data, 9)[2:-4]
    assert dec.decompress(z) == data


def test_foreign_stream_device_indexed(corpus, dec):
    data = corpus("binary", 30000)
    z = zlib.compress(data, 6)[2:-4]
    out, recs, _ = hi.inflate_raw(z)
    assert out == data
    idx = {"block_bits": [r.bit_offset for r in recs],
           "block_bytes": [r.out_offset for r in recs], "n": len(out)}
    assert dec.decompress(z, index=idx) == data


def test_host_decodes_all_zlib_levels(corpus):
    data = corpus("text", 8000)
    for level in range(10):
        z = zlib.compress(data, level)[2:-4]
        out, recs, _ = hi.inflate_raw(z)
        assert out == data
    # stored blocks appear at level 0
    z0 = zlib.compress(data, 0)[2:-4]
    _, recs, _ = hi.inflate_raw(z0)
    assert any(r.btype == 0 for r in recs)


# --- validity matrix (reference: inflator.c error taxonomy) ---

def test_reserved_block_type():
    with pytest.raises(errors.BadBlockError):
        hi.inflate_raw(b"\x07\x00\x00")   # BTYPE=11


def test_len_nlen_mismatch():
    bad = bytes([0x01, 0x05, 0x00, 0x12, 0x34])
    with pytest.raises(errors.BadBlockError):
        hi.inflate_raw(bad)


def test_truncated_stream(corpus):
    data = corpus("text", 5000)
    z = zlib.compress(data, 6)[2:-4]
    with pytest.raises(errors.JDeflateError):
        hi.inflate_raw(z[: len(z) // 2])


def test_far_offset(corpus):
    # a dictionary-referencing stream decoded WITHOUT the dictionary must
    # fail with a too-far offset (INFLT_EFAROFFSET semantics)
    dict_ = corpus("text", 4000)
    data = dict_[:2000]
    raw, _ = RawDeflater(level=6, block_size=4096, batch=1).compress(
        data, dictionary=dict_)
    with pytest.raises(errors.FarOffsetError):
        hi.inflate_raw(raw)


def test_oversubscribed_tree():
    with pytest.raises(errors.BadTreeError):
        hi._Decoder(np.array([1, 1, 1]))   # three 1-bit codes


def test_incomplete_tree_rejected_for_litlen():
    with pytest.raises(errors.BadTreeError):
        hi._Decoder(np.array([2, 2, 2]))   # kraft < 1


def test_incomplete_single_code_dist_tree_allowed():
    d = hi._Decoder(np.array([1, 0, 0]), allow_incomplete_single=True)
    assert d is not None


def test_device_detects_corruption(corpus, dec):
    """Structural corruption must raise, never return garbage. (Flips that
    turn one valid code into another equally-valid code of the same length
    are undetectable at the raw-DEFLATE level — zlib returns wrong bytes
    silently for those too; the zstrm checksums catch them. So corrupt a
    block HEADER, which always breaks structure.)"""
    data = corpus("text", 12000)
    raw, idx = RawDeflater(level=6, block_size=4096, batch=1).compress(data)
    bad = bytearray(raw)
    hdr_byte = (idx["block_bits"][1] >> 3) + 1   # inside block 1's header
    bad[hdr_byte] ^= 0xFF
    with pytest.raises(errors.JDeflateError):
        dec.decompress(bytes(bad), index=idx)


def test_split_stored_block_indexed_decode(rng, dec):
    # incompressible 64K+ blocks are stored split across two LEN fields
    # (MAXSTRDSIZE, deflator.c:794); the indexed decoder must walk both
    import numpy as np
    data = rng.integers(0, 256, 80000, dtype=np.uint8).tobytes()
    raw, idx = RawDeflater(level=6, block_size=65536, batch=1).compress(data)
    assert dec.decompress(raw, index=idx) == data


class TestForeignIndexedDecode:
    """Foreign (zlib-produced) streams through the parallel anchored path.

    The reference accepts any RFC 1951 stream sequentially
    (inflator.c:764-903); the TPU framework additionally indexes foreign
    streams once (native pass) and decodes them through the same exact
    anchored device path our own index enables."""

    def test_zlib_stream_indexed_roundtrip(self, corpus):
        import zlib
        data = corpus("text", 3 << 20) + corpus("binary", 1 << 20)
        raw = zlib.compress(data, 6)[2:-4]          # strip zlib framing
        dec = RawInflater()
        index = dec.build_index(raw)
        assert index["n"] == len(data)
        assert len(index["block_bits"]) >= 1
        # window anchors present for huffman blocks of meaningful size
        assert any(a is not None and len(a) > 0 for a in index["win"])
        out = dec.decompress(raw, index=index)
        assert out == data

    def test_zlib_indexed_no_fallback(self, corpus):
        """The windowed device path must succeed (err == 0), not fall back."""
        import zlib
        from jdeflate_tpu.codec import inflate as I
        data = corpus("text", 1 << 20)
        raw = zlib.compress(data, 9)[2:-4]
        dec = RawInflater()
        index = dec.build_index(raw)
        out = dec.decompress(raw, index=index)
        assert out == data
        stats = dec.last_stats
        assert stats and any(k == "win" for k, _, _ in stats)
        assert all(err == 0 for _, _, err in stats)

    def test_foreign_stored_and_dynamic_mix(self, corpus):
        import zlib
        data = corpus("random", 200_000) + corpus("text", 300_000)
        raw = zlib.compress(data, 1)[2:-4]
        dec = RawInflater()
        index = dec.build_index(raw)
        assert dec.decompress(raw, index=index) == data


def test_native_batched_header_parse(corpus):
    """parse_block_headers (one native call) == per-block parse_block_header
    across stored/static/dynamic blocks (decodednmc analog; VERDICT r2 #7)."""
    from jdeflate_tpu.stream import native
    if not native.available():
        pytest.skip("native library unavailable")
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = b""
    for part in (corpus("text", 40000), bytes(2000), corpus("random", 3000)):
        raw += co.compress(part) + co.flush(zlib.Z_FULL_FLUSH)
    raw += co.flush()
    _, recs_all, _ = native.inflate(raw, want_index=True)
    bits = [r.bit_offset for r in recs_all]
    batched = native.parse_block_headers(raw, bits)
    single = [native.parse_block_header(raw, b) for b in bits]
    assert len(batched) == len(single) >= 2
    for a, b in zip(batched, single):
        assert a.btype == b.btype and a.bfinal == b.bfinal
        assert a.sym_bit_offset == b.sym_bit_offset
        assert a.out_len == b.out_len
        if a.btype in (1, 2):
            assert np.array_equal(a.litlen_lengths, b.litlen_lengths)
            assert np.array_equal(a.dist_lengths, b.dist_lengths)


def test_native_batched_header_parse_error(corpus):
    from jdeflate_tpu.stream import native
    if not native.available():
        pytest.skip("native library unavailable")
    data = corpus("text", 5000)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    with pytest.raises(errors.JDeflateError):
        native.parse_block_headers(raw, [0, 8 * len(raw) - 2])
