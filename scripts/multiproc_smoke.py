"""Multi-PROCESS distributed smoke: jax.distributed over N processes on one
machine (SURVEY.md §4 item 4 — the fake multi-host backend).

Each process owns a shard of the input, encodes it into an independent gzip
member on its own devices, and the members are ordered-gathered across
processes (multihost_utils.process_allgather over padded buffers + a length
vector — the DCN-side analog of the ICI gather in parallel/shard.py); the
coordinator concatenates members (RFC 1952 §2.2), combines per-shard CRCs
with the GF(2) algebra (reference crc32 combine,
/root/reference/src/zstrm.c:1427-1443), and verifies the stream.

Run:  python scripts/multiproc_smoke.py            (spawns the workers)
      -> prints one JSON line {"ok": true, ...}
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
PORT = 18765


def worker(pid: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils
    sys.path.insert(0, REPO)
    from jdeflate_tpu.parallel import shard as sh
    from jdeflate_tpu.formats import headers as H
    from jdeflate_tpu.ops import checksum as cs
    from jdeflate_tpu.stream import zstrm

    assert jax.process_count() == NPROC
    rng = np.random.default_rng(7)
    data = (b"multi process shard gather " * 4000)[: 100_000] \
        + rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    n = len(data)
    per = (n + NPROC - 1) // NPROC
    mine = data[pid * per:(pid + 1) * per]

    # local shard -> complete gzip member (independent per process)
    member = zstrm.compress(mine, format="gzip", level=1)
    crc = cs.crc32(mine)

    # ordered cross-process gather: fixed-capacity padded buffers + length
    # vector (the host-side analog of a ragged all-gather over DCN)
    CAP = per * 2 + 4096
    buf = np.zeros(CAP, np.uint8)
    buf[:len(member)] = np.frombuffer(member, np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray([len(member), len(mine), crc], np.int64))
    bufs = multihost_utils.process_allgather(buf)

    if pid == 0:
        blob = b"".join(bufs[p][: int(lens[p][0])].tobytes()
                        for p in range(NPROC))
        out = zstrm.decompress(blob)
        # combined whole-input CRC from per-shard CRCs (GF(2) combine)
        total_crc = 0
        for p in range(NPROC):
            total_crc = cs.crc32_combine(total_crc, int(lens[p][2]),
                                         int(lens[p][1]))
        ok = out == data and total_crc == cs.crc32(data)
        print(json.dumps({"ok": bool(ok), "processes": NPROC,
                          "bytes": n, "members": NPROC,
                          "combined_crc_ok": total_crc == cs.crc32(data)}),
              flush=True)
        if not ok:
            sys.exit(1)
    multihost_utils.sync_global_devices("done")


def main():
    if "JD_MP_PID" in os.environ:
        worker(int(os.environ["JD_MP_PID"]))
        return
    procs = []
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    for pid in range(NPROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**env, "JD_MP_PID": str(pid)},
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL))
    out, _ = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=60)
    line = out.decode().strip().splitlines()[-1]
    print(line)
    sys.exit(0 if json.loads(line).get("ok") else 1)


if __name__ == "__main__":
    main()
