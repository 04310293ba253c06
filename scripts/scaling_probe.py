"""Sharded-encode scaling evidence on a virtual CPU mesh (BASELINE
configs[4], VERDICT r3 ask #4).

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.

What this produces (bench_details.sharded_members):
  * functional checks: 1/2/4/8-device meshes encode the same corpus into a
    valid multi-member gzip; members decode through the device path;
  * measured collective volume: the exact bytes each collective moves on
    this run (lengths all-gather, member gather under both candidate
    designs), from the run's real shard lengths/capacities;
  * scaling_efficiency_est: a strong-scaling model T(N) = T(1)/N + T_comm
    with T(1) taken from the REAL-TPU device-compute measurement
    (bench_details encode_device_GBps) and T_comm = gather_bytes / DCN_BW
    with the bandwidth assumption stated — per-shard compute is fully
    independent (32 KiB DEFLATE window bound), so communication is the only
    efficiency loss;
  * the padded-all-gather vs host-collect decision (SURVEY §7 step 7),
    made on the measured byte volumes.

Wall-clock ratios on this 2-core host are core-bound and labeled as such —
they are NOT scaling evidence.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

DCN_GBPS = 10.0          # conservative per-host DCN bandwidth assumption
ICI_GBPS = 45.0          # per-link ICI (v5e), for the intra-slice lengths


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
    meas = None
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
        # keep the last successful iteration so a device count outside
        # {1,2,4,8} still yields a measurement (ADVICE r4)
        if d == ndev or d == 8:
            ok = gzip.decompress(blob) == data
            ok_dev = decompress_members(blob, info) == data
            out["members_gzip_ok"] = ok
            out["members_device_decode_ok"] = ok_dev
        lens = [m[1] for m in info["members"]]      # (start, length, ...)
        out["n_members"] = len(info["members"])
        meas = (d, lens, len(blob))
    # label: 2-core-host wall times are core-bound, not scaling evidence
    out["wall_s_by_devices_COREBOUND_2core_host"] = walls

    # ---- measured collective volume (from this run's real lengths) ----
    d, lens, blob_len = meas
    cap = max(lens)
    lengths_allgather_B = 4 * d * d               # (D,) i32 gathered to all
    host_collect_B = sum(lens)                    # exact member bytes, once
    padded_allgather_B = d * d * cap              # every device gets all,
    #                                               padded to the max member
    out["collectives_measured"] = {
        "n_shards": d,
        "member_lengths": lens,
        "lengths_allgather_bytes": lengths_allgather_B,
        "member_gather_host_collect_bytes": host_collect_B,
        "member_gather_padded_allgather_bytes": padded_allgather_B,
        "decision": ("host_collect: moves %dx fewer bytes on this run and "
                     "only the host needs the members for output assembly"
                     % max(padded_allgather_B // max(host_collect_B, 1), 1)),
    }

    # ---- strong-scaling efficiency model anchored to real-TPU numbers ----
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enc_gbps = dec_gbps = None
    try:
        with open(os.path.join(repo, "bench_details.json")) as f:
            bd = json.load(f)
        enc_gbps = bd.get("encode_device_GBps")
        dec_gbps = bd.get("decode_device_GBps")
        corpus = bd.get("corpus_bytes", 8 << 20)
        ratio = bd.get("ratio", 4.9)
    except OSError:
        corpus, ratio = 8 << 20, 4.9

    model = {"method": (
        "strong scaling of the bench corpus over N hosts: per-shard compute"
        " is independent (32 KiB window bound), so T(N) = T(1)/N + T_comm;"
        " T(1) from the real-TPU device-compute measurement in this file;"
        " T_comm = host-collect member bytes / DCN + lengths all-gather /"
        " ICI, with DCN=%s GB/s, ICI=%s GB/s assumed" % (DCN_GBPS, ICI_GBPS))}
    for name, gbps in (("encode", enc_gbps), ("decode", dec_gbps)):
        if not gbps:
            continue
        t1 = corpus / (gbps * 1e9)
        comp_bytes = corpus / ratio
        eff = {}
        for n in (2, 4, 8):
            t_comm = (comp_bytes / (DCN_GBPS * 1e9)
                      + 4 * n * n / (ICI_GBPS * 1e9))
            tn = t1 / n + t_comm
            eff[str(n)] = round(t1 / (n * tn), 5)
        model[name + "_efficiency_by_hosts"] = eff
    out["scaling_efficiency_est"] = model
    print(json.dumps(out))


if __name__ == "__main__":
    main()
