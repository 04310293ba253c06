"""Huffman builder: optimality vs brute force, Kraft validity, canonical codes
(SURVEY.md §4 test strategy, item 1)."""
import heapq

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jdeflate_tpu.ops import huffman as hf
from jdeflate_tpu.formats import constants as C


def ref_huffman_cost(freqs):
    """Unlimited-depth optimal cost via a simple heap Huffman."""
    h = [f for f in freqs if f > 0]
    if len(h) <= 1:
        return sum(h)  # single symbol coded in 1 bit
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


def kraft(lengths, max_bits=15):
    return sum((1 << (max_bits - l)) for l in lengths if l > 0)


@pytest.mark.parametrize("seed", range(6))
def test_code_lengths_optimal_small(seed):
    rng = np.random.default_rng(seed)
    n = 32
    freqs = rng.integers(0, 50, n).astype(np.int32)
    freqs[rng.integers(0, n)] += 1000
    lengths = np.asarray(hf.code_lengths(jnp.asarray(freqs), 15))
    m = int((freqs > 0).sum())
    if m >= 2:
        assert kraft(lengths) == 1 << 15, "code must be complete"
        got = int((freqs * lengths).sum())
        assert got == ref_huffman_cost(list(freqs)), "must be optimal"
    assert lengths.max() <= 15
    assert all((l == 0) == (f == 0) for l, f in zip(lengths, freqs))


def test_code_lengths_depth_limit():
    # Fibonacci-ish frequencies force deep trees; limit must hold + stay complete.
    fib = [1, 1]
    for _ in range(28):
        fib.append(fib[-1] + fib[-2])
    freqs = np.array(fib, dtype=np.int32)
    lengths = np.asarray(hf.code_lengths(jnp.asarray(freqs), 15))
    assert lengths.max() == 15
    assert kraft(lengths) == 1 << 15


def test_code_lengths_precode_limit():
    rng = np.random.default_rng(7)
    freqs = rng.integers(0, 1000, 19).astype(np.int32)
    lengths = np.asarray(hf.code_lengths(jnp.asarray(freqs), 7))
    assert lengths.max() <= 7
    assert kraft(lengths, 7) == 1 << 7


def test_degenerate_trees():
    # no symbols
    l0 = np.asarray(hf.code_lengths(jnp.zeros(30, jnp.int32), 15))
    assert (l0 == 0).all()
    # one symbol -> forced pair of length-1 codes so the tree is complete
    # (reference computelengths forces >=2 symbols, deflator.c:1138-1178)
    f = np.zeros(30, np.int32)
    f[13] = 42
    l1 = np.asarray(hf.code_lengths(jnp.asarray(f), 15))
    assert l1[13] == 1 and l1.sum() == 2 and (l1 <= 1).all()
    # two symbols
    f[5] = 1
    l2 = np.asarray(hf.code_lengths(jnp.asarray(f), 15))
    assert l2[13] == 1 and l2[5] == 1 and l2.sum() == 2


def test_canonical_codes_match_numpy_reference():
    rng = np.random.default_rng(3)
    lengths = rng.integers(0, 9, 288)
    lengths[lengths == 1] = 0  # keep it a plausible multiset? not required
    codes_np = C.canonical_codes(lengths)
    codes, rev = hf.canonical_codes(jnp.asarray(lengths, jnp.int32), 15)
    assert (np.asarray(codes) == codes_np).all()
    rev_np = C.reverse_bits(codes_np, lengths)
    assert (np.asarray(rev) == rev_np).all()


def test_fixed_table_codes():
    codes, rev = hf.canonical_codes(jnp.asarray(C.FIXED_LITLEN_LENGTHS), 15)
    assert (np.asarray(codes) == C.FIXED_LITLEN_CODES).all()
    # RFC 3.2.6: symbol 0 -> 00110000, symbol 256 -> 0000000, symbol 280 -> 11000000
    assert int(codes[0]) == 0b00110000
    assert int(codes[256]) == 0
    assert int(codes[280]) == 0b11000000


def test_batched_build():
    rng = np.random.default_rng(11)
    freqs = rng.integers(0, 100, (4, 286)).astype(np.int32)
    lengths, codes, rev = hf.build_codes(jnp.asarray(freqs), 15)
    assert lengths.shape == (4, 286)
    for b in range(4):
        l = np.asarray(lengths[b])
        assert kraft(l) == 1 << 15


@pytest.mark.parametrize("seed", range(6))
def test_package_merge_never_worse_and_valid(seed):
    """code_lengths_pm: Kraft == 1, depth-limited, cost <= two-queue+repair
    (package-merge is exactly optimal under the limit)."""
    rng = np.random.default_rng(seed)
    for n, L in ((286, 15), (30, 15), (19, 7)):
        for kind in range(5):
            if kind == 0:
                f = rng.integers(0, 100, n)
            elif kind == 1:
                f = (rng.random(n) < 0.1) * rng.integers(1, 10000, n)
            elif kind == 2:
                f = np.zeros(n, np.int64); f[rng.integers(0, n)] = 5
            elif kind == 3:
                f = np.zeros(n, np.int64)
                k = int(rng.integers(2, n))
                f[:k] = 2 ** rng.integers(0, 14, k)   # forces length limit
            else:
                f = np.ones(n, np.int64)
            fj = jnp.asarray(f, jnp.int32)
            l_new = np.asarray(hf.code_lengths_pm(fj, L))
            l_old = np.asarray(hf.code_lengths(fj, L))
            m = int((f > 0).sum())
            assert l_new.max() <= L
            if m >= 2:
                assert np.all((l_new > 0) == (f > 0))
                kraft = np.sum(1.0 / 2.0 ** l_new[l_new > 0])
                assert abs(kraft - 1.0) < 1e-9
                assert np.sum(f * l_new) <= np.sum(f * l_old)
            elif m == 1:
                assert (l_new > 0).sum() == 2
                assert set(l_new[l_new > 0].tolist()) == {1}
            else:
                assert l_new.sum() == 0
