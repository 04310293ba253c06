import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
"""Dev harness for ops/expand3.py: numpy referee + synthetic token sets,
interpret mode on CPU. Run: JAX_PLATFORMS=cpu python scripts/dev_expand3.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import dev_expand3_kernel as ex3  # moved out of package (VERDICT r4 #4)

TOK_LIT = 1 << 30
TOK_MATCH = 2 << 30


def mk_lit(sym):
    return TOK_LIT | sym


def mk_match(length, dist):
    return TOK_MATCH | length | ((dist - 1) << 9)


def referee(tok_lm, halo):
    out = bytearray()
    hist = bytearray(halo)
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
                    out.append(out[p] if p >= 0 else hist[p])
    return bytes(out)


def run_case(name, lanes, halo=None, out_cap=None):
    """lanes: list of lists of tokens (<=32 each)."""
    L = max(len(lanes), 1)
    tok = np.zeros((L, 32), np.uint32)
    for i, ln in enumerate(lanes):
        tok[i, :len(ln)] = ln
    halo_b = np.zeros(ex3.HALO, np.uint8) if halo is None else halo
    ref = referee(tok, halo_b)
    outlen = np.zeros(L, np.int32)
    for i, ln in enumerate(lanes):
        s = 0
        for t in ln:
            k = (t >> 30) & 3
            s += 1 if k == 1 else (t & 0x1FF if k == 2 else 0)
        outlen[i] = s
    cap = out_cap or max(1 << 12, 1 << (len(ref) - 1).bit_length())
    out, produced, kerr = ex3.expand_tokens(
        jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo_b), cap,
        interpret=True)
    out = np.asarray(out)
    p = int(produced)
    ok = p == len(ref) and bytes(out[:p]) == ref and int(kerr) == 0
    if not ok:
        print(f"FAIL {name}: produced={p} expect={len(ref)} kerr={int(kerr)}")
        if p == len(ref):
            got = bytes(out[:p])
            for i in range(min(p, len(ref))):
                if got[i] != ref[i]:
                    print(f"  first diff at {i}: got {got[i]} want {ref[i]}"
                          f"  ctx got={got[max(0,i-5):i+8].hex()} "
                          f"want={ref[max(0,i-5):i+8].hex()}")
                    break
    else:
        print(f"ok   {name} ({len(ref)} bytes)")
    return ok


rng = np.random.default_rng(7)
allok = True

# 1. single literal run
allok &= run_case("lits", [[mk_lit(ord('a') + i) for i in range(10)]])

# 2. literal + far match into halo
h = np.arange(ex3.HALO, dtype=np.uint8)
allok &= run_case("halo-match", [[mk_lit(65), mk_match(20, 100)]], halo=h)

# 3. RLE dist=1 long
allok &= run_case("rle", [[mk_lit(66), mk_match(258, 1)]])

# 4. record chain: 96-byte records copied repeatedly (in-lane + cross-lane)
lanes = [[mk_lit((i * 7) % 256) for i in range(24)] for _ in range(4)]
for _ in range(20):
    lanes.append([mk_match(96, 96), mk_match(96, 96)])
allok &= run_case("records", lanes)

# 5. overlap 128<d<len
allok &= run_case("bigoverlap",
                  [[mk_lit(i % 256) for i in range(32)] for _ in range(6)]
                  + [[mk_match(258, 150)]])

# 6. mixed random vs zlib-style structure
lanes = []
out_len = 0
for _ in range(200):
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
allok &= run_case("random-mix", lanes)

# 7. empty lanes interleaved
allok &= run_case("sparse", [[mk_lit(1)], [], [], [mk_match(3, 1)], [],
                             [mk_lit(2), mk_lit(3)]])

# 8. many tiles (cross-chunk DMA): > 512 lanes
lanes = [[mk_lit(int(rng.integers(0, 256))) for _ in range(3)]
         for _ in range(1100)]
lanes[600] = [mk_match(258, 7), mk_match(40, 32000)]
allok &= run_case("multichunk", lanes)

print("ALL OK" if allok else "FAILURES", flush=True)
sys.exit(0 if allok else 1)
