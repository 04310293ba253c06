"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on CPU (xla_force_host_platform_device_count)
per SURVEY.md §4.4 — the real-TPU path is exercised by bench.py / the driver.
Must run before jax initializes.
"""
import os

_TPU_TESTS = os.environ.get("JDT_TPU_TESTS") == "1"
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; tests must run on the virtual 8-device CPU mesh, so
# override it back before any backend is initialized. JDT_TPU_TESTS=1 keeps
# the real TPU for tests/test_tpu_paths.py (run alone: one process per TPU).
if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Tests validate correctness, not ratio; deep probe settings only slow the
# CPU compiles down. Ratio/perf runs live in bench.py on real hardware; the
# real probe depths are exercised there and by the TPU-path pytest marker.
from jdeflate_tpu.codec import levels as _levels

if not _TPU_TESTS:
    _levels._PROBE_CAP.update({5: 8, 6: 8, 7: 8, 8: 8, 9: 8})


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_corpus(rng, kind: str, n: int) -> bytes:
    """Deterministic test payloads with different compressibility profiles."""
    if kind == "text":
        words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ",
                 b"lazy ", b"dog ", b"pack ", b"my ", b"box ", b"with ",
                 b"five ", b"dozen ", b"liquor ", b"jugs \n"]
        out = bytearray()
        while len(out) < n:
            out += words[int(rng.integers(len(words)))]
        return bytes(out[:n])
    if kind == "random":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return b"\x00" * n
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(0, 4))]) * int(rng.integers(1, 300))
        return bytes(out[:n])
    if kind == "binary":
        # struct-like: repeating records with noise
        rec = rng.integers(0, 256, 64, dtype=np.uint8)
        out = bytearray()
        while len(out) < n:
            r = rec.copy()
            r[rng.integers(0, 64)] = rng.integers(0, 256)
            out += r.tobytes()
        return bytes(out[:n])
    raise ValueError(kind)


@pytest.fixture(scope="session")
def corpus(rng):
    return lambda kind, n: make_corpus(rng, kind, n)
