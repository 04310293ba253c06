"""Device mesh construction for data-parallel compression.

The reference is strictly single-threaded (SURVEY.md §2.5); every parallel
axis here is new design. The primary axis is data parallelism over a 1-D
'dp' mesh: DEFLATE's 32 KiB window bound makes input sharding legal, and
gzip member concatenation (RFC 1952) / sync-flush seams (RFC 1951) make the
per-shard outputs recomposable bit-exactly.

Multi-host: `jax.distributed.initialize()` before calling `make_mesh()` picks
up all processes' devices; shard_map collectives then ride ICI within a slice
and DCN across hosts.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DP_AXIS,))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
