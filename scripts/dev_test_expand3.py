"""expand3 (v4 MXU batch engine) vs a byte-level referee, interpret mode.

Covers the adversarial geometries from VERDICT r3 ask #9: dist=1 RLE chains,
record chains (copy-of-copy), 128<dist<len overlap splits, halo-edge
matches, run/segment boundaries, sparse lanes, multi-chunk DMA streaming.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dev_expand3_kernel as ex3  # moved out of package (VERDICT r4 #4)

TOK_LIT = 1 << 30
TOK_MATCH = 2 << 30


def mk_lit(sym):
    return TOK_LIT | sym


def mk_match(length, dist):
    return TOK_MATCH | length | ((dist - 1) << 9)


def referee(tok_lm, halo):
    out = bytearray()
    for lane in tok_lm:
        for t in lane:
            k = (int(t) >> 30) & 3
            if k == 0:
                break
            if k == 1:
                out.append(int(t) & 0xFF)
            else:
                ln = int(t) & 0x1FF
                d = ((int(t) >> 9) & 0x7FFF) + 1
                for _ in range(ln):
                    p = len(out) - d
                    out.append(out[p] if p >= 0 else halo[p])
    return bytes(out)


def run_case(lanes, halo=None):
    L = max(len(lanes), 1)
    tok = np.zeros((L, 32), np.uint32)
    outlen = np.zeros(L, np.int32)
    for i, ln in enumerate(lanes):
        tok[i, :len(ln)] = ln
        s = 0
        for t in ln:
            k = (t >> 30) & 3
            s += 1 if k == 1 else (t & 0x1FF if k == 2 else 0)
        outlen[i] = s
    halo_b = np.zeros(ex3.HALO, np.uint8) if halo is None else halo
    ref = referee(tok, halo_b)
    cap = max(1 << 12, 1 << (max(len(ref) - 1, 1)).bit_length())
    out, produced, kerr = ex3.expand_tokens(
        jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo_b), cap,
        interpret=True)
    assert int(kerr) == 0
    assert int(produced) == len(ref)
    assert bytes(np.asarray(out)[:len(ref)]) == ref


def test_literal_runs():
    run_case([[mk_lit(ord('a') + i) for i in range(10)]])


def test_halo_match_at_edge():
    h = np.arange(ex3.HALO, dtype=np.uint8)
    # dist 32768 reaches the very first halo byte
    run_case([[mk_match(8, 32768), mk_lit(65), mk_match(20, 100)]], halo=h)


def test_rle_dist1_len258():
    run_case([[mk_lit(66), mk_match(258, 1)]])


def test_record_chains():
    lanes = [[mk_lit((i * 7) % 256) for i in range(24)] for _ in range(4)]
    for _ in range(20):
        lanes.append([mk_match(96, 96), mk_match(96, 96)])
    run_case(lanes)


def test_big_overlap_split():
    # 128 < dist < len exercises the extraction two-piece split
    run_case([[mk_lit(i % 256) for i in range(32)] for _ in range(6)]
             + [[mk_match(258, 150)], [mk_match(200, 129)]])


def test_sparse_lanes():
    run_case([[mk_lit(1)], [], [], [mk_match(3, 1)], [],
              [mk_lit(2), mk_lit(3)]])


def test_random_mix_small():
    rng = np.random.default_rng(11)
    lanes = []
    out_len = 0
    for _ in range(40):
        ln = []
        for _ in range(rng.integers(1, 6)):
            if out_len < 4 or rng.random() < 0.4:
                n = int(rng.integers(1, 8))
                ln += [mk_lit(int(rng.integers(0, 256))) for _ in range(n)]
                out_len += n
                if len(ln) > 28:
                    break
            else:
                d = int(rng.integers(1, min(out_len, 32768) + 1))
                l_ = int(rng.integers(3, 259))
                ln.append(mk_match(l_, d))
                out_len += l_
        lanes.append(ln[:32])
    run_case(lanes)


@pytest.mark.slow
def test_multichunk_dma():
    rng = np.random.default_rng(3)
    lanes = [[mk_lit(int(rng.integers(0, 256))) for _ in range(3)]
             for _ in range(1100)]
    lanes[600] = [mk_match(258, 7), mk_match(40, 32000)]
    run_case(lanes)
