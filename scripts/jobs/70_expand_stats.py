"""Token/dependency statistics to parameterize the round-5 expansion engine.

Parses the tokens of the bench corpus (our encoder, level 6) and reports:
  - literal vs match byte fractions, items per 128B output row
  - match-byte distance histogram (which gather-window tiers pay off)
  - per-STEP intra-step dependency depth (rounds a step-sequential
    resolver needs), for step sizes 2/4/8 KiB
All host-side; no TPU needed (encode runs on whatever backend is default).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import make_corpus  # noqa: E402


def parse_tokens(raw: bytes):
    """(off, dist, length, lit) per token in stream order; stored blocks
    emit lit-run pseudo tokens (dist=0, len=n)."""
    from jdeflate_tpu.formats import constants as C
    from jdeflate_tpu.stream.host_inflate import (_BitReader, _Decoder,
                                                  parse_block_header)
    toks = []          # (out_off, dist, length)  dist=0 -> literal run
    pos = 0
    out_off = 0
    nbits = len(raw) * 8
    while pos < nbits - 10:
        br = _BitReader(raw, pos)
        bfinal = br.read(1)
        btype = br.read(2)
        if btype == 0:
            br.align_byte()
            ln = br.read(16)
            br.read(16)
            toks.append((out_off, 0, ln))
            out_off += ln
            pos = br.pos + 8 * ln
            if bfinal:
                break
            continue
        rec = parse_block_header(raw, pos)
        br.pos = rec.sym_bit_offset
        ldec = _Decoder(rec.litlen_lengths)
        ddec = _Decoder(rec.dist_lengths, allow_incomplete_single=True)
        run = 0
        while True:
            s = ldec.decode(br)
            if s < 256:
                run += 1
                continue
            if run:
                toks.append((out_off, 0, run))
                out_off += run
                run = 0
            if s == 256:
                break
            li = s - 257
            length = int(C.LENGTH_BASE[li]) + br.read(int(C.LENGTH_EXTRA[li]))
            d = ddec.decode(br)
            dist = int(C.DIST_BASE[d]) + br.read(int(C.DIST_EXTRA[d]))
            toks.append((out_off, dist, length))
            out_off += length
        pos = br.pos
        if bfinal:
            break
    return toks, out_off


def main():
    n = 4 << 20
    data = make_corpus(n)
    from jdeflate_tpu.codec.deflate import RawDeflater
    t0 = time.time()
    enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
    raw, idx = enc.compress(data)
    print(f"encode: {time.time()-t0:.1f}s  ratio {n/len(raw):.3f}")

    t0 = time.time()
    toks, total = parse_tokens(raw)
    print(f"parse: {time.time()-t0:.1f}s  tokens={len(toks)} out={total}")
    assert total == n, (total, n)

    off = np.array([t[0] for t in toks], np.int64)
    dist = np.array([t[1] for t in toks], np.int64)
    ln = np.array([t[2] for t in toks], np.int64)
    is_m = dist > 0
    mbytes = ln[is_m].sum()
    lbytes = ln[~is_m].sum()
    print(f"match tokens {is_m.sum()} bytes {mbytes} ({mbytes/n:.1%})  "
          f"lit runs {(~is_m).sum()} bytes {lbytes}  "
          f"avg mlen {ln[is_m].mean():.1f} avg lrun {ln[~is_m].mean():.1f}")
    print(f"items per 128B row: avg {len(toks)/(n/128):.2f} ")
    # max items overlapping any 128B row
    row_of = off // 128
    cnt = np.bincount(row_of, minlength=n // 128)
    print(f"token STARTS per row: max {cnt.max()}, p99.9 "
          f"{np.percentile(cnt, 99.9):.0f}")

    # distance tiers weighted by match bytes
    md, mlen = dist[is_m], ln[is_m]
    for lim in (64, 128, 512, 2048, 4096, 8192, 16384, 32768):
        f = mlen[md <= lim].sum() / mbytes
        print(f"  match bytes with d <= {lim:6d}: {f:.1%}")
    print(f"  overlapping (d < len): {mlen[md < mlen].sum()/mbytes:.1%}")

    # per-step dependency rounds (collapsed source model):
    # src(p) = toff - d + (p - toff) % d  for p in a match starting at toff.
    # Step-sequential resolver: positions with src < step base resolve in
    # round 1; else round[src]+1.  Compute per-position rounds vectorized-ish.
    for STEP in (2048, 4096, 8192):
        t0 = time.time()
        rounds = np.zeros(n, np.int16)       # 0 = literal/immediate
        maxr_hist = np.zeros(64, np.int64)
        # process matches in stream order; rounds of sources already known
        for o, d, l in toks:
            if d == 0:
                continue
            p = np.arange(o, o + l)
            src = o - d + (p - o) % d
            base = (p // STEP) * STEP
            r = np.where(src < base, 1,
                         rounds[np.minimum(src, o - 1)] + 1)
            rounds[o:o + l] = r
        # rounds needed per step = max over positions in step
        nst = n // STEP
        stepmax = np.zeros(nst, np.int64)
        np.maximum.at(stepmax, np.arange(n) // STEP, rounds)
        for v in stepmax:
            maxr_hist[min(v, 63)] += 1
        tot_rounds = stepmax.sum()
        print(f"STEP {STEP}: rounds/step avg {stepmax.mean():.2f} "
              f"max {stepmax.max()}  total rounds {tot_rounds} "
              f"({time.time()-t0:.0f}s)")
        nz = np.nonzero(maxr_hist)[0]
        print("   hist:", {int(k): int(maxr_hist[k]) for k in nz[:12]})


if __name__ == "__main__":
    main()
