"""Ratio cost of window-restart seams (independent R-byte segments).

If segments of R bytes are encoded with NO history crossing the seam, the
decode-side expansion can process all segments in parallel (the round-5
engine question). This measures what that costs in ratio at level 6/9 on
the bench corpus, vs the one-stream baseline and vs the jdeflate oracle.

Runs on CPU (JAX_PLATFORMS=cpu) so it can sit alongside a TPU job.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import make_corpus, build_oracle, oracle_size  # noqa: E402


def main():
    n = 2 << 20
    data = make_corpus(n)
    oracle = build_oracle()
    jd6 = len(oracle_size(oracle, data, 6)) if oracle else None
    print(f"corpus {n}  jdeflate L6 {jd6}")

    from jdeflate_tpu.codec.deflate import RawDeflater
    for level in (6,):
        # baseline: one stream, 64K blocks (halo chained)
        t0 = time.time()
        enc = RawDeflater(level=level, block_size=1 << 16, batch=16)
        raw, _ = enc.compress(data)
        s0 = len(raw)
        print(f"L{level} baseline 1-stream: {s0}  "
              f"vs_jd {s0/jd6:.4f}  ({time.time()-t0:.0f}s)")
        for R in (1 << 14, 1 << 15, 1 << 16, 1 << 17):
            t0 = time.time()
            bl = min(R, 1 << 16)
            e = RawDeflater(level=level, block_size=bl, batch=max(1, R // bl))
            tot = 0
            for i in range(0, n, R):
                r, _ = e.compress(data[i:i + R])
                tot += len(r)
            print(f"L{level} restart R={R>>10}K: {tot}  "
                  f"vs_base {tot/s0:.4f}  vs_jd {tot/jd6:.4f}  "
                  f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
