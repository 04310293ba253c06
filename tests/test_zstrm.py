"""Framing layer tests: gzip/zlib round-trips vs the Python gzip/zlib oracle,
autodetection, dictionary protocol, checksum verification, streaming
(SURVEY.md §4 item 2, BASELINE configs[2])."""
import gzip as _gzip
import zlib

import pytest

import jdeflate_tpu as jd
from jdeflate_tpu.utils import errors


@pytest.mark.parametrize("fmt", ["raw", "zlib", "gzip"])
def test_roundtrip_ours(corpus, fmt):
    data = corpus("text", 20000)
    blob = jd.compress(data, format=fmt, level=6, block_size=4096, batch=2)
    assert jd.decompress(blob, format=fmt) == data


def test_gzip_oracle_decodes_us(corpus):
    data = corpus("binary", 15000)
    blob = jd.compress(data, format="gzip", level=6, block_size=4096, batch=2)
    assert _gzip.decompress(blob) == data


def test_zlib_oracle_decodes_us(corpus):
    data = corpus("text", 15000)
    blob = jd.compress(data, format="zlib", level=6, block_size=4096, batch=2)
    assert zlib.decompress(blob) == data


def test_we_decode_gzip_oracle(corpus):
    data = corpus("text", 15000)
    assert jd.decompress(_gzip.compress(data, 6)) == data


def test_we_decode_zlib_oracle(corpus):
    data = corpus("runs", 15000)
    assert jd.decompress(zlib.compress(data, 9)) == data


def test_autodetect(corpus):
    data = corpus("text", 5000)
    for fmt in ("zlib", "gzip"):
        blob = jd.compress(data, format=fmt, block_size=4096, batch=1)
        assert jd.decompress(blob, format="auto") == data


def test_gzip_header_flags(corpus):
    # gzip with FNAME etc. (written by the gzip module) must parse
    data = corpus("text", 5000)
    import io
    buf = io.BytesIO()
    with _gzip.GzipFile(filename="somename.txt", mode="wb", fileobj=buf) as f:
        f.write(data)
    assert jd.decompress(buf.getvalue()) == data


def test_zlib_dictionary_protocol(corpus):
    dict_ = corpus("text", 6000)
    data = dict_[:3000] + corpus("text", 2000)
    blob = jd.compress(data, format="zlib", level=6, dictionary=dict_,
                       block_size=4096, batch=1)
    # oracle decodes with the dictionary
    d = zlib.decompressobj(zdict=dict_)
    assert d.decompress(blob) + d.flush() == data
    # we decode our own
    assert jd.decompress(blob, dictionary=dict_) == data
    # missing dictionary -> error
    with pytest.raises(errors.MissingDictError):
        jd.decompress(blob)
    # wrong dictionary -> error
    with pytest.raises(errors.BadDictError):
        jd.decompress(blob, dictionary=b"not the dictionary")
    # we decode zlib's dictionary streams
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, 0, zdict=dict_)
    zblob = c.compress(data) + c.flush()
    assert jd.decompress(zblob, dictionary=dict_) == data


def test_checksum_verification(corpus):
    data = corpus("text", 8000)
    blob = bytearray(jd.compress(data, format="gzip", block_size=4096, batch=1))
    blob[-6] ^= 0xFF   # corrupt CRC field
    with pytest.raises(errors.ChecksumError):
        jd.decompress(bytes(blob))
    blob2 = bytearray(jd.compress(data, format="zlib", block_size=4096, batch=1))
    blob2[-2] ^= 0xFF  # corrupt adler field
    with pytest.raises(errors.ChecksumError):
        jd.decompress(bytes(blob2))


def test_gzip_rejects_dictionary(corpus):
    with pytest.raises(errors.IncorrectUseError):
        jd.compress(b"x", format="gzip", dictionary=b"d")


def test_streaming_zstream(corpus):
    data = corpus("text", 40000)
    z = jd.ZStream("deflate", format="gzip", level=6, block_size=4096, batch=2)
    out = bytearray()
    for i in range(0, len(data), 7000):
        z.write(data[i:i + 7000])
        out += z.read()
    out += z.flush(final=True)
    assert _gzip.decompress(bytes(out)) == data
    assert z.total_in == len(data)
    assert z.total_out == len(out)


def test_streaming_sync_flush_segments(corpus):
    data = corpus("text", 30000)
    z = jd.ZStream("deflate", format="zlib", level=6, block_size=4096, batch=1)
    out = bytearray()
    z.write(data[:10000])
    out += z.flush(final=False)       # sync seam mid-stream
    z.write(data[10000:])
    out += z.flush(final=True)
    assert zlib.decompress(bytes(out)) == data


def test_stream_poisoning(corpus):
    z = jd.ZStream("deflate", format="gzip", block_size=4096, batch=1)
    with pytest.raises(errors.IncorrectUseError):
        z.flush(final=True) and z.write(b"more")  # write after final
        z.write(b"more")
    with pytest.raises(errors.StreamPoisonedError):
        z.write(b"again")


def test_empty_roundtrip():
    for fmt in ("raw", "zlib", "gzip"):
        blob = jd.compress(b"", format=fmt)
        assert jd.decompress(blob, format=fmt) == b""
    assert _gzip.decompress(jd.compress(b"", format="gzip")) == b""


def test_compress_with_index_device_decode(corpus):
    data = corpus("text", 20000)
    blob, index, hl = jd.compress_with_index(
        data, format="gzip", level=6, block_size=4096, batch=2)
    assert jd.decompress(blob, index=index, header_len=hl) == data

def test_inflate_stream_feed_finish(corpus):
    data = corpus("text", 20000)
    blob = jd.compress(data, format="gzip", block_size=4096, batch=2)
    z = jd.ZStream("inflate", format="auto")
    for i in range(0, len(blob), 1000):
        z.feed(blob[i:i + 1000])
    assert z.finish() == data
    with pytest.raises(errors.IncorrectUseError):
        z.write(b"x")


def test_inflate_stream_poisoned_on_bad_data():
    z = jd.ZStream("inflate", format="auto")
    # bad data may be detected eagerly at feed() (member draining) or at
    # finish(); either way the stream must poison afterwards
    with pytest.raises(errors.JDeflateError):
        z.feed(b"\x1f\x8b\x08\x00garbagegarbage")
        z.finish()
    with pytest.raises(errors.StreamPoisonedError):
        z.feed(b"more")


def test_multimember_gzip_decompress(corpus):
    """RFC 1952 §2.2: concatenated gzip members decode as one output."""
    a = corpus("text", 30000)
    b = corpus("binary", 20000)
    blob = jd.compress(a, format="gzip") + jd.compress(b, format="gzip")
    assert jd.decompress(blob) == a + b
    import gzip
    assert gzip.decompress(blob) == a + b


def test_inflate_streaming_members_incremental(corpus):
    parts = [corpus("text", 15000), corpus("runs", 9000), corpus("text", 5000)]
    blob = b"".join(jd.compress(p, format="gzip") for p in parts)
    z = jd.ZStream("inflate", format="gzip")
    got = bytearray()
    step = 700
    for i in range(0, len(blob), step):
        z.feed(blob[i:i + step])
        got += z.read()          # incremental member-granular output
    got += z.finish()
    assert bytes(got) == b"".join(parts)
    assert z.used_input == len(blob)
    assert z.unused_data == b""


def test_inflate_trailing_data_accounting(corpus):
    """Reference usedinput contract (zstrm.c:888-908): consumed bytes are
    reported and trailing data is preserved."""
    data = corpus("text", 8000)
    blob = jd.compress(data, format="gzip")
    trailer = b"NOT GZIP DATA"
    z = jd.ZStream("inflate", format="gzip")
    z.feed(blob + trailer)
    out = z.finish()
    assert out == data
    assert z.used_input == len(blob)
    assert z.unused_data == trailer


def test_inflate_zlib_trailing_and_used(corpus):
    data = corpus("binary", 6000)
    blob = jd.compress(data, format="zlib")
    z = jd.ZStream("inflate", format="zlib")
    z.feed(blob + b"XYZ")
    assert z.finish() == data
    assert z.used_input == len(blob)
    assert z.unused_data == b"XYZ"


def test_truncated_member_errors(corpus):
    data = corpus("text", 20000)
    blob = jd.compress(data, format="gzip")
    z = jd.ZStream("inflate", format="gzip")
    z.feed(blob[:len(blob) // 2])
    with pytest.raises(errors.InputEndError):
        z.finish()


def test_checksum_suppress_skips_verification(corpus):
    data = corpus("text", 5000)
    blob = bytearray(jd.compress(data, format="gzip"))
    blob[-6] ^= 0xFF             # corrupt stored CRC (not the payload)
    z = jd.ZStream("inflate", format="gzip", checksum="suppress")
    z.feed(bytes(blob))
    assert z.finish() == data    # corrupted CRC ignored
    z2 = jd.ZStream("inflate", format="gzip")
    with pytest.raises(errors.JDeflateError):   # eager at feed, or at finish
        z2.feed(bytes(blob))
        z2.finish()


def test_fixed_codes_flag(corpus):
    """DEFLT_FIXEDCODES analog (deflator.h:74-76): every block uses the
    static trees; output stays decodable and BTYPE is never dynamic."""
    data = corpus("text", 30000)
    blob = jd.compress(data, format="raw", fixed_codes=True)
    import zlib
    assert zlib.decompress(blob, -15) == data
    from jdeflate_tpu.stream import host_inflate as hi
    _, recs, _ = hi.inflate_raw(blob)
    assert all(r.btype != 2 for r in recs)


class TestResetChecksumCallbacks:
    """reset() reuse, checksum 'force' exposure, and IO callback plumbing
    (reference zstrm_reset; ZSTRM_DOCRC32/DOADLER32 zstrm.h:53-61, 124-125;
    TZStrmIFn/TZStrmOFn zstrm.h:92-101)."""

    def test_reset_reuse(self, corpus):
        from jdeflate_tpu.stream.zstrm import ZStream, decompress
        z = ZStream("deflate", format="gzip", level=6)
        a = corpus("text", 50_000)
        z.write(a)
        blob_a = z.flush(final=True)
        z.reset()
        b = corpus("binary", 30_000)
        z.write(b)
        blob_b = z.flush(final=True)
        assert decompress(blob_a) == a
        assert decompress(blob_b) == b
        assert z.total_in == len(b)

    def test_reset_clears_poison(self):
        from jdeflate_tpu.stream.zstrm import ZStream
        from jdeflate_tpu.utils import errors
        z = ZStream("deflate", format="gzip")
        with pytest.raises(errors.IncorrectUseError):
            z.feed(b"x")                       # misuse poisons
        with pytest.raises(errors.StreamPoisonedError):
            z.write(b"y")
        z.reset()
        z.write(b"hello")
        assert z.flush(final=True)

    def test_checksum_force_exposes_both(self, corpus):
        import zlib as _z
        from jdeflate_tpu.stream.zstrm import ZStream
        data = corpus("text", 40_000)
        z = ZStream("deflate", format="raw", checksum="force")
        z.write(data)
        blob = z.flush(final=True)
        assert _z.decompress(blob, -15) == data
        assert z.crc32 == _z.crc32(data)
        assert z.adler32 == _z.adler32(data)

    def test_checksum_force_on_inflate(self, corpus):
        import zlib as _z
        from jdeflate_tpu.stream.zstrm import ZStream, compress
        data = corpus("binary", 30_000)
        blob = compress(data, format="gzip")
        z = ZStream("inflate", format="auto", checksum="force")
        z.feed(blob)
        assert z.finish() == data
        assert z.crc32 == _z.crc32(data)
        assert z.adler32 == _z.adler32(data)

    def test_io_callbacks_roundtrip(self, corpus):
        from jdeflate_tpu.stream.zstrm import ZStream
        data = corpus("text", 150_000)
        src = [data[i:i + 7000] for i in range(0, len(data), 7000)]
        pulled = iter(src + [b""])
        sink = []
        z = ZStream("deflate", format="gzip",
                    source_fn=lambda n: next(pulled),
                    target_fn=sink.append)
        rest = z.run()
        blob = b"".join(sink) + rest
        out_sink = []
        blob_parts = [blob[i:i + 9000] for i in range(0, len(blob), 9000)]
        pulled2 = iter(blob_parts + [b""])
        zi = ZStream("inflate", format="auto",
                     source_fn=lambda n: next(pulled2),
                     target_fn=out_sink.append)
        rest2 = zi.run()
        assert b"".join(out_sink) + rest2 == data


class TestEmbeddedIndex:
    """FEXTRA-embedded parallel-decode index (RFC 1952 §2.3.1.1): the
    flagship compress/decompress pair round-trips through the windowed
    device path with no in-memory index handoff, and foreign decoders
    skip the subfield."""

    def test_embed_roundtrip_and_interop(self, corpus):
        import gzip as _g
        from jdeflate_tpu.stream import zstrm
        data = corpus("text", 300_000)
        blob = zstrm.compress(data, format="gzip", embed_index=True)
        assert _g.decompress(blob) == data          # foreign interop
        assert zstrm.decompress(blob) == data

    def test_embed_uses_windowed_path(self, corpus):
        from jdeflate_tpu.stream import zstrm
        from jdeflate_tpu.codec import inflate as I
        data = corpus("binary", 200_000)
        blob = zstrm.compress(data, format="gzip", embed_index=True)
        I.STATS_LOG.clear()
        out = zstrm.decompress(blob)
        assert out == data
        calls = [(k, e) for k, _, e in I.STATS_LOG]
        assert calls and any(k == "win" for k, _ in calls)
        assert all(e == 0 for _, e in calls)

    def test_embed_multimember(self, corpus):
        from jdeflate_tpu.stream import zstrm
        a = corpus("text", 120_000)
        b = corpus("runs", 90_000)
        blob = (zstrm.compress(a, format="gzip", embed_index=True)
                + zstrm.compress(b, format="gzip", embed_index=True))
        assert zstrm.decompress(blob) == a + b


class TestBoundedStreaming:
    """Bounded-memory streaming inflate below member granularity (reference
    inflate driver, zstrm.c:792-958): a large single-member stream fed in
    small chunks never buffers more than chunk + one block."""

    def test_single_member_chunked_bounded(self, corpus):
        from jdeflate_tpu.stream.zstrm import ZStream, compress
        data = corpus("text", 6 << 20)
        blob = compress(data, format="gzip", level=1)
        z = ZStream("inflate", format="auto")
        out = bytearray()
        peak = 0
        CH = 1 << 20
        for i in range(0, len(blob), CH):
            z.feed(blob[i:i + CH])
            peak = max(peak, len(z._buf))
            out += z.read()
        out += z.finish()
        assert bytes(out) == data
        assert peak < 2 * CH, f"peak buffering {peak}"
        assert z.used_input == len(blob)

    def test_zlib_chunked(self, corpus):
        import zlib as _z
        from jdeflate_tpu.stream.zstrm import ZStream
        data = corpus("binary", 2 << 20)
        blob = _z.compress(data, 6)
        z = ZStream("inflate", format="auto")
        for i in range(0, len(blob), 65536):
            z.feed(blob[i:i + 65536])
        assert z.finish() == data

    def test_multimember_then_trailing(self, corpus):
        from jdeflate_tpu.stream.zstrm import ZStream, compress
        a = corpus("text", 200_000)
        b = corpus("runs", 100_000)
        blob = (compress(a, format="gzip") + compress(b, format="gzip")
                + b"TRAILING")
        z = ZStream("inflate", format="auto")
        for i in range(0, len(blob), 30_000):
            z.feed(blob[i:i + 30_000])
        out = z.finish()
        assert out == a + b
        assert z.unused_data == b"TRAILING"

    def test_truncated_raises_at_finish(self, corpus):
        from jdeflate_tpu.stream.zstrm import ZStream, compress
        from jdeflate_tpu.utils import errors
        blob = compress(corpus("text", 100_000), format="gzip")
        z = ZStream("inflate", format="auto")
        z.feed(blob[:len(blob) // 2])
        with pytest.raises(errors.JDeflateError):
            z.finish()
