"""Production-depth ratio guards (VERDICT r4 #6).

conftest caps probe depths to 8 for CPU speed, so the real level 7-9
configurations (probes 128/320/512, probe_words 16) were only exercised by
bench and the gated TPU suite — a high-level ratio regression would pass CPU
CI. These slow-marked tests restore the production depths for one encode per
level and pin the compressed size against the compiled reference oracle
(the same oracle bench.py uses; skipped when it cannot build).

Bounds are measured values on this exact corpus + small headroom, so a
regression in the matchfinder/lazy heuristics at production depth surfaces
here without TPU access.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from jdeflate_tpu.codec import levels as levels_mod
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.stream.host_inflate import inflate_raw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.slow

_PROD_CAPS = {1: 2, 2: 8, 3: 16, 4: 24, 5: 32, 6: 48, 7: 128, 8: 320, 9: 512}

# measured size_vs_oracle on the 192 KiB test corpus below (see bound
# refresh note in each assert) + regression headroom
_BOUNDS = {7: 1.010, 8: 1.005, 9: 1.005}


@pytest.fixture(scope="module")
def oracle_exe():
    from bench import build_oracle
    exe = build_oracle()
    if exe is None:
        pytest.skip("oracle (compiled reference) unavailable")
    return exe


@pytest.fixture(scope="module")
def prod_corpus():
    from tests.conftest import make_corpus
    r = np.random.default_rng(99)
    return (make_corpus(r, "text", 96 * 1024)
            + make_corpus(r, "binary", 48 * 1024)
            + make_corpus(r, "runs", 48 * 1024))


@pytest.fixture()
def prod_depths():
    saved = dict(levels_mod._PROBE_CAP)
    levels_mod._PROBE_CAP.update(_PROD_CAPS)
    try:
        yield
    finally:
        levels_mod._PROBE_CAP.clear()
        levels_mod._PROBE_CAP.update(saved)


def _oracle_size(exe, data: bytes, level: int) -> int:
    out = subprocess.run([exe, "c", str(level)], input=data,
                         capture_output=True, timeout=600).stdout
    assert out
    return len(out)


@pytest.mark.parametrize("level", [7, 8, 9])
def test_prod_depth_ratio(level, prod_corpus, prod_depths, oracle_exe):
    cfg = levels_mod.get_level(level)
    assert cfg.probes == _PROD_CAPS[level], \
        "production probe depth must be in effect for this test"
    enc = RawDeflater(level=level, block_size=1 << 15, batch=4)
    raw, _ = enc.compress(prod_corpus)
    out, _, _ = inflate_raw(raw)
    assert out == prod_corpus
    osize = _oracle_size(oracle_exe, prod_corpus, level)
    ratio = len(raw) / osize
    assert ratio <= _BOUNDS[level], (
        f"level {level} production-depth size regressed: "
        f"{len(raw)} vs oracle {osize} ({ratio:.4f} > {_BOUNDS[level]})")
