"""Reproduce the TPU-only decode mismatch at small scale and bisect which
stage diverges from the CPU reference values."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec.inflate import RawInflater, decode_batch
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.ops import decode as dk


def corpus(n):
    rng = np.random.default_rng(0)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
    return b"".join(words[int(rng.integers(5))] for _ in range(n // 4))[:n]


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    for size, bl in ((20000, 4096), (200000, 16384), (1000000, 65536)):
        data = corpus(size)
        raw, idx = RawDeflater(level=6, block_size=bl, batch=4).compress(data)
        out = RawInflater().decompress(raw, index=idx)
        ok = out == data
        print(f"n={size} bl={bl}: roundtrip {ok}", flush=True)
        if not ok:
            a = np.frombuffer(out, np.uint8)
            b = np.frombuffer(data, np.uint8)
            m = min(len(a), len(b))
            neq = np.nonzero(a[:m] != b[:m])[0]
            print(f"  len {len(out)} vs {len(data)}; mismatches {len(neq)}; "
                  f"first {neq[:6]}", flush=True)
            # stage probe: wavefront f values vs CPU
            return


if __name__ == "__main__":
    main()
