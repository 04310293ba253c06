"""Encoder round-trip vs the zlib oracle (SURVEY.md §4 item 2): every stream
we produce must be decodable by Python zlib, bit-exactly reproducing input."""
import zlib

import numpy as np
import pytest

from jdeflate_tpu.codec.deflate import RawDeflater


def zlib_raw_inflate(raw: bytes, dictionary: bytes = b"") -> bytes:
    d = zlib.decompressobj(-15, zdict=dictionary) if dictionary else \
        zlib.decompressobj(-15)
    out = d.decompress(raw)
    out += d.flush()
    return out


@pytest.mark.parametrize("kind", ["text", "runs", "random", "zeros", "binary"])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_roundtrip_single_batch(corpus, kind, level):
    data = corpus(kind, 3000)
    enc = RawDeflater(level=level, block_size=4096, batch=2)
    raw, index = enc.compress(data)
    assert zlib_raw_inflate(raw) == data


@pytest.mark.parametrize("level", [1, 6])
def test_roundtrip_multiblock_multibatch(corpus, level):
    # 5 blocks of 2048 across batches of 2 -> sync-flush seams exercised
    data = corpus("text", 5 * 2048 + 123)
    enc = RawDeflater(level=level, block_size=2048, batch=2)
    raw, index = enc.compress(data)
    assert zlib_raw_inflate(raw) == data
    assert len(index["block_bits"]) == 6
    assert index["sync_points"], "expected at least one sync-flush seam"


def test_roundtrip_exact_block_boundary(corpus):
    data = corpus("text", 4096 * 2)
    enc = RawDeflater(level=6, block_size=4096, batch=4)
    raw, _ = enc.compress(data)
    assert zlib_raw_inflate(raw) == data


def test_empty_input():
    raw, _ = RawDeflater(level=6).compress(b"")
    assert zlib_raw_inflate(raw) == b""


def test_tiny_inputs(corpus):
    enc = RawDeflater(level=6, block_size=1024, batch=1)
    for n in (1, 2, 3, 4, 300):
        data = corpus("text", n)
        raw, _ = enc.compress(data)
        assert zlib_raw_inflate(raw) == data


def test_preset_dictionary(corpus):
    dictionary = corpus("text", 8000)
    data = dictionary[:3000] + corpus("text", 1000)
    enc = RawDeflater(level=6, block_size=4096, batch=1)
    raw, _ = enc.compress(data, dictionary=dictionary)
    assert zlib_raw_inflate(raw, dictionary) == data
    # dictionary should help: compare against no-dict size
    raw2, _ = enc.compress(data)
    assert len(raw) < len(raw2)


def test_compression_sane_ratio(corpus):
    # loose sanity under the test-profile (reduced probes): within 30% of
    # zlib level 6. Real ratio targets are validated by bench.py against the
    # compiled jdeflate reference.
    data = corpus("text", 30000)
    enc = RawDeflater(level=6, block_size=32768, batch=1)
    raw, _ = enc.compress(data)
    z = zlib.compress(data, 6)[2:-4]  # strip zlib framing
    assert len(raw) <= len(z) * 1.30


def test_incompressible_stored_fallback(corpus):
    # random data must fall back to stored blocks (~n + small overhead),
    # mirroring the reference's stored path (compress0, deflator.c:796-926)
    data = corpus("random", 20000)
    raw, _ = RawDeflater(level=6, block_size=4096, batch=2).compress(data)
    assert zlib_raw_inflate(raw) == data
    assert len(raw) <= len(data) + 80


def test_level0_stored(corpus):
    data = corpus("text", 10000)
    raw, _ = RawDeflater(level=0, block_size=4096, batch=2).compress(data)
    assert zlib_raw_inflate(raw) == data
    assert len(raw) >= len(data)
