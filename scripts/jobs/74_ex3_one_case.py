"""One TPU case: records chain (isolates worker-death + correctness)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jdeflate_tpu.ops import expand3 as ex3

TOK_LIT = 1 << 30
TOK_MATCH = 2 << 30
def mk_lit(s): return TOK_LIT | s
def mk_match(l, d): return TOK_MATCH | l | ((d - 1) << 9)

def referee(tok_lm, halo):
    out = bytearray()
    for lane in tok_lm:
        for t in lane:
            k = (int(t) >> 30) & 3
            if k == 0: break
            if k == 1: out.append(int(t) & 0xFF)
            else:
                ln = int(t) & 0x1FF
                d = ((int(t) >> 9) & 0x7FFF) + 1
                for _ in range(ln):
                    p = len(out) - d
                    out.append(out[p] if p >= 0 else halo[p])
    return bytes(out)

def run_case(name, lanes, halo=None):
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
    hb = np.zeros(ex3.HALO, np.uint8) if halo is None else halo
    ref = referee(tok, hb)
    cap = max(1 << 12, 1 << (len(ref) - 1).bit_length())
    out, produced, kerr = ex3.expand_tokens(
        jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(hb), cap)
    out = np.asarray(out); p = int(produced)
    ok = p == len(ref) and bytes(out[:p]) == ref and int(kerr) == 0
    if ok:
        print(f"ok {name} ({p} bytes)", flush=True)
    else:
        print(f"FAIL {name} produced={p}/{len(ref)} kerr={int(kerr)}", flush=True)
        got = bytes(out[:min(p, len(ref))])
        diffs = [i for i in range(len(got)) if got[i] != ref[i]]
        print("ndiffs", len(diffs), "first", diffs[:8], flush=True)
        if diffs:
            i = diffs[0]
            print("got ", got[max(0,i-4):i+8].hex(), flush=True)
            print("want", ref[max(0,i-4):i+8].hex(), flush=True)
    return ok

lanes = [[mk_lit((i * 7) % 256) for i in range(24)] for _ in range(4)]
for _ in range(20):
    lanes.append([mk_match(96, 96), mk_match(96, 96)])
run_case("records", lanes)
print("done", flush=True)
