"""Checksums vs the zlib oracle (SURVEY.md §4 test strategy, item 1)."""
import zlib

import numpy as np
import pytest

from jdeflate_tpu.ops import checksum as cs


@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 511, 512, 513, 4096, 65536, 100001])
@pytest.mark.parametrize("kind", ["text", "random", "zeros"])
def test_adler32_matches_zlib(corpus, kind, n):
    data = corpus(kind, n)
    assert cs.adler32(data) == zlib.adler32(data)


def test_adler32_init(corpus):
    a = corpus("text", 1000)
    b = corpus("random", 777)
    assert cs.adler32(b, init=zlib.adler32(a)) == zlib.adler32(a + b)


def test_adler32_combine(corpus):
    a = corpus("text", 12345)
    b = corpus("binary", 6789)
    got = cs.adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
    assert got == zlib.adler32(a + b)


@pytest.mark.parametrize("n", [1, 8, 255, 256, 257, 1024, 4095, 4096, 65536, 100001])
@pytest.mark.parametrize("kind", ["text", "random", "zeros"])
def test_crc32_matches_zlib(corpus, kind, n):
    data = corpus(kind, n)
    assert cs.crc32(data) == zlib.crc32(data)


def test_crc32_init(corpus):
    a = corpus("text", 1000)
    b = corpus("random", 777)
    assert cs.crc32(b, init=zlib.crc32(a)) == zlib.crc32(a + b)


@pytest.mark.parametrize("la,lb", [(0, 5), (5, 0), (1, 1), (1000, 1), (12345, 6789)])
def test_crc32_combine(corpus, la, lb):
    a = corpus("binary", la) if la else b""
    b = corpus("text", lb) if lb else b""
    got = cs.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert got == zlib.crc32(a + b)


def test_empty():
    assert cs.adler32(b"") == 1
    assert cs.crc32(b"") == 0
