"""Real-TPU path tests (VERDICT round-1 item 9).

The main suite forces an 8-device CPU mesh (conftest), where the Pallas
walk/expand kernels and the anchored decode take CPU fallbacks. These tests
exercise the production TPU kernels on the real chip; they self-skip unless
JDT_TPU_TESTS=1 (the verify skill runs them: only one process may hold the
TPU, so they must not run alongside another TPU job).

Run:  JDT_TPU_TESTS=1 python -m pytest tests/test_tpu_paths.py -x -q
(conftest honors JDT_TPU_TESTS by not forcing the CPU platform.)
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("JDT_TPU_TESTS") != "1",
    reason="real-TPU path tests; set JDT_TPU_TESTS=1 (verify skill)")


@pytest.fixture(scope="module")
def tpu_backend():
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend in this process")
    return jax.default_backend()


def _corpus(n):
    rng = np.random.default_rng(42)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over "]
    out = bytearray()
    while len(out) < n:
        k = int(rng.integers(6))
        out += words[k] if k < 5 else rng.integers(
            0, 256, 64, dtype=np.uint8).tobytes()
    return bytes(out[:n])


def test_tpu_full_levels_roundtrip(tpu_backend):
    """Production probe depths (uncapped by conftest) + Pallas walk kernel +
    windowed decode + expand kernel, on the real chip."""
    import zlib
    from jdeflate_tpu.codec.deflate import RawDeflater
    from jdeflate_tpu.codec import inflate as I
    data = _corpus(1 << 20)
    for level in (1, 6, 9):
        enc = RawDeflater(level=level, block_size=1 << 16, batch=16)
        raw, idx = enc.compress(data)
        assert zlib.decompress(raw, -15) == data
        dec = I.RawInflater()
        out = dec.decompress(raw, index=idx)
        assert out == data
        stats = dec.last_stats
        assert stats and any(k == "win" for k, _, _ in stats), stats
        assert all(e == 0 for _, _, e in stats), stats


def test_tpu_expand_kernel_small_dists(tpu_backend):
    """RLE-heavy data drives the Pallas match-expansion kernel's
    overlapping-copy path (dist < len)."""
    from jdeflate_tpu.codec.deflate import RawDeflater
    from jdeflate_tpu.codec.inflate import RawInflater
    rng = np.random.default_rng(3)
    data = b"".join(bytes([int(rng.integers(4))]) * int(rng.integers(1, 400))
                    for _ in range(3000))[: 1 << 20]
    enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
    raw, idx = enc.compress(data)
    assert RawInflater().decompress(raw, index=idx) == data


def test_tpu_foreign_indexed(tpu_backend):
    """zlib-produced stream through build_index + device anchored decode."""
    import zlib
    from jdeflate_tpu.codec.inflate import RawInflater
    data = _corpus(1 << 20)
    raw = zlib.compress(data, 6)[2:-4]
    dec = RawInflater()
    index = dec.build_index(raw)
    assert dec.decompress(raw, index=index) == data
