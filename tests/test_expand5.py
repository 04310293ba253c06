"""expand5 (plan + windowed-gather resolve) vs a byte-level referee.

Same adversarial geometries as the expand3 suite: dist=1 RLE chains,
copy-of-copy record chains, overlap splits, halo-edge matches, deep
nesting chains, sparse lanes. Runs the pure-jnp referee pipeline on CPU;
the Pallas kernels are exercised by the gated TPU suite and bench.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jdeflate_tpu.ops import expand5 as ex5

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
    halo_b = np.zeros(ex5.HALO, np.uint8) if halo is None else halo
    ref = referee(tok, halo_b)
    cap = max(1 << 12, 1 << (max(len(ref) - 1, 1)).bit_length())
    out, produced = ex5.expand_tokens_ref(
        jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo_b), cap)
    assert int(produced) == len(ref)
    assert bytes(np.asarray(out[:len(ref)])) == ref


def test_literals_only():
    run_case([[mk_lit(i & 0xFF) for i in range(20)]])


def test_rle_dist1():
    run_case([[mk_lit(7), mk_match(258, 1), mk_match(100, 1)]])


def test_overlap_2_3():
    run_case([[mk_lit(1), mk_lit(2), mk_match(9, 2), mk_match(10, 3)]])


def test_copy_of_copy_chain():
    lanes = [[mk_lit((3 * i) & 0xFF) for i in range(16)]]
    for k in range(12):                      # deep nesting chain
        lanes.append([mk_match(16, 16)])
    run_case(lanes)


def test_halo_edge():
    halo = (np.arange(ex5.HALO) % 251).astype(np.uint8)
    run_case([[mk_match(50, 32768), mk_match(20, 32000), mk_lit(9)]],
             halo=halo)


def test_sparse_lanes():
    lanes = [[mk_lit(5)], [], [mk_match(30, 1)], [], [],
             [mk_lit(1), mk_lit(2), mk_match(200, 2)]]
    run_case(lanes)


def test_long_match_crossing_steps():
    # 258-byte matches spanning 2 KiB step boundaries, chained
    lanes = [[mk_lit((i * 7) & 0xFF) for i in range(32)]]
    for _ in range(40):
        lanes.append([mk_match(258, 31), mk_match(258, 257)])
    run_case(lanes)


def test_random_token_soup():
    rng = np.random.default_rng(7)
    lanes = [[mk_lit(int(rng.integers(256))) for _ in range(8)]]
    total = 8
    for _ in range(300):
        lane = []
        for _ in range(int(rng.integers(1, 5))):
            if rng.random() < 0.5:
                lane.append(mk_lit(int(rng.integers(256))))
                total += 1
            else:
                ln = int(rng.integers(3, 259))
                d = int(rng.integers(1, min(total, 32768) + 1))
                lane.append(mk_match(ln, d))
                total += ln
        lanes.append(lane)
    run_case(lanes)


def test_phase_mod_exactness():
    # d values that stress the f32 floor-divide mod path (phase up to 257)
    lanes = [[mk_lit((32 * j + i) & 0xFF) for i in range(32)]
             for j in range(9)]                       # 288 seed literals
    for d in (1, 2, 3, 5, 7, 31, 63, 64, 127, 128, 129, 251, 255, 256, 257):
        lanes.append([mk_match(258, d)])
    run_case(lanes)


def test_seed16_encoding_with_spill_matches_plan_seeds():
    """The 16-bit seed path (fast (L,8) slice + top-k spill pass) must
    place exactly the plan seeds slot_attrs would produce, including for
    lanes with more than S_SLICE tokens and d=32768 matches."""
    rng = np.random.default_rng(3)
    L, cap = 64, 1 << 13
    tok = np.zeros((L, 32), np.uint32)
    outlen = np.zeros(L, np.int32)
    total = 0
    for i in range(L):
        ntok = int(rng.integers(1, 14))      # some lanes spill (> 8)
        s = 0
        for c in range(ntok):
            if total + s < 4 or rng.random() < 0.7:
                tok[i, c] = mk_lit(int(rng.integers(0, 256)))
                s += 1
            else:
                d = int(rng.integers(1, min(total + s, 32768) + 1))
                if rng.random() < 0.05:
                    d = min(32768, total + s)
                ln = int(rng.integers(3, 40))
                tok[i, c] = mk_match(ln, d)
                s += ln
        outlen[i] = s
        total += s
    assert total < cap
    tok_j = jnp.asarray(tok)
    ol_j = jnp.asarray(outlen)

    # expected: full-slot plan seeds via the referee scatter
    off_all, seed_all = ex5.slot_attrs(tok_j, ol_j)
    S_expect = ex5.seed_scatter_ref(off_all, seed_all, cap)

    # actual: 16-bit fast-slice scatter + spill pass, decoded to plan packs
    off8, seed8 = ex5.slot_attrs16(tok_j, ol_j)
    S16 = np.zeros(cap, np.int64)
    off8_n, seed8_n = np.asarray(off8), np.asarray(seed8)
    for o, s in zip(off8_n, seed8_n):
        if s and 0 <= o < cap:
            S16[o] = max(S16[o], s)
    S16f, err = ex5.spill_pass(tok_j, ol_j,
                               jnp.asarray(S16.astype(np.int32)), cap)
    assert int(err) == 0
    got = ex5.seed16_to_plan(S16f)
    assert np.array_equal(np.asarray(got), np.asarray(S_expect))
