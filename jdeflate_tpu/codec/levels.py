"""Compression level configs.

Mirrors the reference's per-level match-search tuning table
(setparameters, src/deflator.c:241-263): (good, nice, chain) =
L1=(8,4,2) L2=(8,8,8) L3=(8,16,16) L4=(8,32,32) L5=(8,64,128)
L6=(16,16,48) L7=(32,64,128) L8=(64,128,320) L9=(192,256,512);
levels 1-5 parse greedily, 6-9 lazily (compress1/compress2).

`probes` is the batched hash-bucket probe depth — the TPU analog of the
reference's `chain` walk bound (each probe visits the same candidate the
chain walk would, newest first).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class LevelConfig:
    level: int
    probes: int        # hash-bucket candidates examined per position
    lazy: bool
    good_length: int   # lazy: accept immediately at or above this length
    nice_length: int   # search effort cap (advisory)
    rerank: int        # frontier re-ranking rounds (long-match recovery)


_CHAIN = {1: 2, 2: 8, 3: 16, 4: 32, 5: 128, 6: 48, 7: 128, 8: 320, 9: 512}
_GOOD = {1: 8, 2: 8, 3: 8, 4: 8, 5: 8, 6: 16, 7: 32, 8: 64, 9: 192}
_NICE = {1: 4, 2: 8, 3: 16, 4: 32, 5: 64, 6: 16, 7: 64, 8: 128, 9: 256}
_PROBE_CAP = {1: 2, 2: 8, 3: 16, 4: 24, 5: 32, 6: 48, 7: 64, 8: 128, 9: 256}
_RERANK = {1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0, 7: 1, 8: 1, 9: 2}


def get_level(level: int) -> LevelConfig:
    if not 0 <= level <= 9:
        raise ValueError(f"level must be 0..9, got {level}")
    if level == 0:
        # stored-only (compress0, deflator.c:796-926): no match search
        return LevelConfig(level=0, probes=0, lazy=False, good_length=0,
                           nice_length=0, rerank=0)
    # good_length: in the reference, reaching `good` merely HALVES the chain
    # walk budget (deflator.c:2651-2653) — it never forces acceptance. The
    # batched probe design has no sequential search left to shorten, so an
    # early-accept analog only loses ratio (measured +4.5% size at level 6);
    # the lazy deferral rule alone decides.
    return LevelConfig(
        level=level,
        probes=min(_CHAIN[level], _PROBE_CAP[level]),
        lazy=level >= 6,
        good_length=259,
        nice_length=_NICE[level],
        rerank=_RERANK[level],
    )
