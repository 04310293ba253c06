"""Sharded-encode scaling proxy on a virtual CPU mesh (BASELINE configs[4]).

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Encodes the same total bytes through ShardedDeflater meshes of 1/2/4/8
devices (members mode), verifies the multi-member gzip output, and decodes
the members through the anchored device path. Prints one JSON line.

On this 2-core host the wall-clock ratio is core-bound; the honest scaling
argument for >= 90% efficiency at N chips is the communication volume: each
shard's compute is fully independent (the DEFLATE 32 KiB window bound), and
the only collective is a (D,)-length all-gather of compressed bit lengths —
4*D bytes per shard vs megabytes of per-shard compute (SURVEY.md §2.5).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import gzip

    from jdeflate_tpu.parallel.mesh import make_mesh
    from jdeflate_tpu.parallel.shard import ShardedDeflater, decompress_members
    import bench as B

    ndev = len(jax.devices())
    data = B.make_corpus(1 << 20)
    out = {"devices_available": ndev, "total_bytes": len(data)}
    walls = {}
    bl, bpd_total = 1 << 14, 8     # 8 blocks of work total, split over mesh
    for d in (1, 2, 4, 8):
        if d > ndev:
            continue
        mesh = make_mesh(d)
        enc = ShardedDeflater(mesh=mesh, level=6, block_size=bl,
                              blocks_per_device=max(bpd_total // d, 1),
                              mode="members")
        blob, info = enc.compress(data)        # warm (compile)
        t0 = time.perf_counter()
        blob, info = enc.compress(data)
        walls[d] = time.perf_counter() - t0
        if d == ndev or d == 8:
            ok = gzip.decompress(blob) == data
            ok_dev = decompress_members(blob, info) == data
            out["members_gzip_ok"] = ok
            out["members_device_decode_ok"] = ok_dev
            out["n_members"] = len(info["members"])
    out["wall_s_by_devices"] = walls
    if 1 in walls and 8 in walls:
        out["wall_ratio_1_to_8"] = walls[1] / walls[8]
    out["collective_bytes_per_shard"] = "4*D (all-gathered lengths) + "\
        "checksum scalars; compute is fully shard-independent"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
