"""Multi-device sharded compression on the virtual 8-device CPU mesh
(SURVEY.md §4 item 4, BASELINE configs[4])."""
import gzip as _gzip
import zlib

import jax
import numpy as np
import pytest

from jdeflate_tpu.parallel.mesh import make_mesh
from jdeflate_tpu.parallel.shard import ShardedDeflater, decompress_members


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_members_mode_roundtrip(corpus, mesh8):
    data = corpus("text", 8 * 2 * 2048 + 777)   # ragged tail shard
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                          blocks_per_device=2, mode="members")
    blob, info = enc.compress(data)
    assert info["mode"] == "members"
    assert len(info["members"]) >= 8
    # the gzip oracle decodes multi-member files
    assert _gzip.decompress(blob) == data
    # our member decoder agrees
    assert decompress_members(blob, info) == data


def test_stream_mode_roundtrip(corpus, mesh8):
    data = corpus("binary", 8 * 2 * 2048 + 123)
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                          blocks_per_device=2, mode="stream")
    blob, info = enc.compress(data)
    # single-member gzip with combined CRC
    assert _gzip.decompress(blob) == data


def test_stream_mode_halo_ratio(corpus, mesh8):
    # stream mode gives shards the previous 32K as halo -> better ratio than
    # members mode on redundant data
    data = corpus("text", 8 * 2048)
    s = ShardedDeflater(mesh=mesh8, level=6, block_size=1024,
                        blocks_per_device=1, mode="stream")
    m = ShardedDeflater(mesh=mesh8, level=6, block_size=1024,
                        blocks_per_device=1, mode="members")
    bs, _ = s.compress(data)
    bm, _ = m.compress(data)
    assert len(bs) < len(bm)


def test_multiple_rounds(corpus, mesh8):
    # input larger than one mesh round (d * bpd * bl)
    data = corpus("runs", 8 * 1024 * 2 * 3 + 55)
    enc = ShardedDeflater(mesh=mesh8, level=5, block_size=1024,
                          blocks_per_device=2, mode="members")
    blob, info = enc.compress(data)
    assert _gzip.decompress(blob) == data


def test_empty_input(mesh8):
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=1024,
                          blocks_per_device=1, mode="members")
    blob, info = enc.compress(b"")
    assert _gzip.decompress(blob) == b""


def test_checksum_combination_matches_zlib(corpus, mesh8):
    data = corpus("text", 8 * 2048 + 99)
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=1024,
                          blocks_per_device=2, mode="stream")
    blob, _ = enc.compress(data)
    import struct
    crc, isize = struct.unpack("<II", blob[-8:])
    assert crc == zlib.crc32(data)
    assert isize == len(data)


def test_members_device_decode(corpus):
    """decompress_members must decode through the windowed device path when
    the sharded encoder's per-member indexes are present (the decode-side
    mirror of sharded encode; gzip members RFC 1952 §2.2)."""
    from jdeflate_tpu.codec import inflate as I
    from jdeflate_tpu.parallel.shard import ShardedDeflater, decompress_members
    data = corpus("text", 200_000) + corpus("binary", 100_000)
    enc = ShardedDeflater(level=6, block_size=1 << 14, blocks_per_device=2,
                          mode="members")
    blob, info = enc.compress(data)
    import gzip
    assert gzip.decompress(blob) == data
    I.STATS_LOG.clear()
    out = decompress_members(blob, info)
    assert out == data
    calls = [(k, e) for k, _, e in I.STATS_LOG]
    assert calls and any(k == "win" for k, _ in calls)
    assert all(e == 0 for _, e in calls)


def test_shard_fault_retry_members(corpus, mesh8):
    """Elastic recovery (SURVEY §5): kill one shard's compressed bytes; the
    verifier must detect it and the retry must re-encode that range so the
    final blob is still correct."""
    data = corpus("text", 8 * 2 * 2048 + 123)
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                          blocks_per_device=2, mode="members", verify=True)
    killed = []

    def hook(k, seg):
        if k == 1 and not killed:
            killed.append(k)
            return seg[:4] + bytes(8) + seg[12:]   # corrupt mid-stream
        return seg

    enc.fault_hook = hook
    blob, info = enc.compress(data)
    assert killed and enc.retries, "fault must trigger a retry"
    assert _gzip.decompress(blob) == data
    assert decompress_members(blob, info) == data


def test_shard_fault_retry_stream(corpus, mesh8):
    data = corpus("binary", 8 * 2 * 2048)
    enc = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                          blocks_per_device=2, mode="stream", verify=True)
    killed = []

    def hook(k, seg):
        if k == 2 and not killed:
            killed.append(k)
            return seg[:-6] + bytes(6)
        return seg

    enc.fault_hook = hook
    blob, info = enc.compress(data)
    assert killed and enc.retries
    assert _gzip.decompress(blob) == data


def test_shard_verify_no_fault_is_clean(corpus, mesh8):
    """verify=True on a healthy run: no retries, identical blob."""
    data = corpus("text", 8 * 2 * 2048)
    a = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                        blocks_per_device=2, mode="members")
    b = ShardedDeflater(mesh=mesh8, level=6, block_size=2048,
                        blocks_per_device=2, mode="members", verify=True)
    blob_a, _ = a.compress(data)
    blob_b, _ = b.compress(data)
    assert not b.retries
    assert blob_a == blob_b
