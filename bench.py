#!/usr/bin/env python
"""Benchmark harness: encode/decode GB/s per chip + size vs the jdeflate
reference oracle, across the five BASELINE.json configs. Prints ONE JSON
line (driver contract).

Headline metric: decode GB/s at level 6 on a Silesia-like mixed corpus
(BASELINE.json north star target: >= 2 GB/s/chip; vs_baseline = value/2.0).
Per-config rows (levels 1/6/9, framed, sharded proxy) go to
bench_details.json.

Transfer context (measured 2026-08-21): the axon tunnel moves ~40 MB/s each
way and the first device->host read drops the process into synchronous
per-dispatch mode (~25 ms/call), so wall-clock GB/s here is dominated by
host<->device transfer of the corpus itself; decode_device_ms /
encode_device_ms report true device-compute time of the main programs
separately (distinct-input cycling harness, scripts/devtime.py), and the
wall headline is best-of-3.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "8"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "6"))
SKIP_EXTRA = os.environ.get("BENCH_SKIP_EXTRA", "") == "1"


def _reference_text(n: int) -> bytes:
    """Deterministic realistic component: the reference's C sources."""
    parts = []
    base = "/root/reference"
    for rel in ("src/deflator.c", "src/inflator.c", "src/zstrm.c",
                "jdeflate/deflator.h", "jdeflate/inflator.h",
                "jdeflate/zstrm.h", "README.md"):
        p = os.path.join(base, rel)
        try:
            with open(p, "rb") as f:
                parts.append(f.read())
        except OSError:
            pass
    blob = b"".join(parts) or b"static fallback text\n" * 1000
    reps = n // len(blob) + 1
    return (blob * reps)[:n]


def make_corpus(n: int) -> bytes:
    """Deterministic Silesia-like mix: real source text, words, records,
    runs, near-random."""
    rng = np.random.default_rng(20260817)
    parts = []
    words = [b"the ", b"of ", b"and ", b"compression ", b"deflate ",
             b"window ", b"entropy ", b"stream ", b"block ", b"huffman ",
             b"match ", b"distance ", b"symbol ", b"encode ", b"decode \n"]
    ref = _reference_text(n)
    ref_pos = 0
    total = 0
    while total < n:
        kind = rng.integers(5)
        if kind == 0:       # synthetic text
            k = int(rng.integers(1 << 16, 1 << 18))
            idx = rng.integers(0, len(words), k // 6)
            seg = b"".join(words[i] for i in idx)[:k]
        elif kind == 1:     # structured records with noise
            rec = rng.integers(0, 256, 96, dtype=np.uint8)
            reps = int(rng.integers(500, 3000))
            m = np.tile(rec, (reps, 1))
            noise = rng.integers(0, 96, reps)
            m[np.arange(reps), noise] = rng.integers(0, 256, reps)
            seg = m.tobytes()
        elif kind == 2:     # runs
            k = int(rng.integers(1 << 15, 1 << 17))
            vals = rng.integers(0, 8, k // 64, dtype=np.uint8)
            seg = np.repeat(vals, 64).tobytes()
        elif kind == 3:     # high entropy
            k = int(rng.integers(1 << 14, 1 << 16))
            seg = rng.integers(0, 256, k, dtype=np.uint8).tobytes()
        else:               # real source text (C code)
            k = int(rng.integers(1 << 16, 1 << 18))
            seg = ref[ref_pos:ref_pos + k]
            ref_pos = (ref_pos + k) % max(len(ref) - (1 << 18), 1)
        parts.append(seg)
        total += len(seg)
    return b"".join(parts)[:n]


def build_oracle() -> str | None:
    exe = os.path.join(REPO, "oracle", "build", "jdeflate_cli")
    if os.path.exists(exe):
        return exe
    try:
        os.makedirs(os.path.dirname(exe), exist_ok=True)
        srcs = [os.path.join("/root/reference/src", f)
                for f in ("deflator.c", "inflator.c", "zstrm.c", "version.c")]
        subprocess.run(
            ["gcc", "-O2", "-I", os.path.join(REPO, "oracle"),
             "-I", "/root/reference",
             "-o", exe, os.path.join(REPO, "oracle", "jdeflate_cli.c")] + srcs,
            check=True, capture_output=True)
        return exe
    except Exception:
        return None


def oracle_size(oracle, data: bytes, level: int):
    out = subprocess.run([oracle, "c", str(level)], input=data,
                         capture_output=True, timeout=600).stdout
    return out


def _device_times(data: bytes, enc, dec, n: int) -> dict:
    """decode_device_ms / encode_device_ms via distinct-input cycling."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from devtime import measure_cycled
    import jax
    import jax.numpy as jnp
    from jdeflate_tpu.codec import inflate as I
    from jdeflate_tpu.codec import deflate as De

    d2 = bytearray(data)
    for p in range(100, len(d2), 8192):
        d2[p] ^= 1
    variants = [data, bytes(d2)]

    # capture via the drivers' own recording hooks (RawDeflater.capture_calls
    # / RawInflater.capture_calls) — no monkeypatching of jit wrappers, so a
    # dispatch refactor cannot silently break this capture again (r4 lesson)
    dec_sets = []
    dec_statics = None
    enc_sets = []
    enc_statics = None
    enc.capture_calls = dec.capture_calls = True
    try:
        for v in variants:
            raw, idx = enc.compress(v)
            out = dec.decompress(raw, index=idx)
            if out != v or not dec.last_calls or not enc.last_calls:
                return {"device_time_error": "capture failed"}
            a = dec.last_calls[0]
            dec_sets.append(a[:4])
            dec_statics = tuple(a[4:])
            enc_sets.append(enc.last_calls[0])
            enc_statics = enc.call_statics
    finally:
        enc.capture_calls = dec.capture_calls = False
        enc.last_calls = []
        dec.last_calls = []
    if any(x.shape != y.shape for x, y in zip(dec_sets[0], dec_sets[1])):
        return {"device_time_error": "bucket mismatch between variants"}

    npe, ne, oc, ww, up = dec_statics[:5]

    def dstage(wf, metas, row, wn):
        return I.decode_batch_windows_stacked(wf, metas, row, wn,
                                              *dec_statics)
    t_dec = measure_cycled(dec_sets, dstage, iters=4)

    def estage(dv, sb, tl, dl_, fb):
        return De.encode_batch_packed(dv, sb, tl, dl_, fb, *enc_statics)
    t_enc = measure_cycled(enc_sets, estage, iters=4)

    return {
        "decode_device_ms": round(t_dec * 1e3, 3),      # per decode batch
        "decode_device_batch_out": int(oc),
        "decode_device_GBps": round(int(oc) / t_dec / 1e9, 4),
        "encode_device_ms": round(t_enc * 1e3, 3),      # per encode segment
        "encode_device_batch_in": enc_statics[0] * enc_statics[1],
        "encode_device_GBps": round(
            enc_statics[0] * enc_statics[1] / t_enc / 1e9, 4),
    }


def _kernel_table(data: bytes, enc, dec) -> dict:
    """Per-kernel device GB/s table (VERDICT r4 #8): walk, expansion,
    checksums, and the encoder's stage budget, measured with the
    distinct-input cycling harness on the real bench batch."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import functools
    from devtime import measure_cycled
    from decode_capture import (capture_decode_sets, walk_inputs_from_call,
                                tok_lm_from_walk)
    import jax
    import jax.numpy as jnp
    from jdeflate_tpu.codec import deflate as De
    from jdeflate_tpu.codec import levels as levels_mod
    from jdeflate_tpu.ops import walk as wk
    from jdeflate_tpu.ops import expand2 as ex2
    from jdeflate_tpu.ops import checksum as cs

    d2 = bytearray(data)
    for p in range(100, len(d2), 8192):
        d2[p] ^= 1
    calls, enc_calls = capture_decode_sets(enc, dec, [data, bytes(d2)])
    wis = [walk_inputs_from_call(c) for c in calls]
    oc = wis[0]["oc"]
    table = {}

    # decode: walk kernel
    wsets = [(w["seg0"], w["seg1"], w["seg2"], w["start_rel"], w["t1r"],
              w["t2ar"], w["t2br"], w["t2cr"]) for w in wis]
    nrows = wis[0]["nrows"]

    def s_walk(s0, s1, s2, sr, a, b, c, d):
        return wk.walk_tpu(s0, s1, s2, sr, a, b, c, d, nrows)
    t = measure_cycled(wsets, s_walk, iters=4)
    table["decode_walk"] = {"ms": round(t * 1e3, 3),
                            "GBps": round(oc / t / 1e9, 3)}

    # decode: expansion engine (default v3 + v5 pipeline)
    esets = []
    for w in wis:
        tok_lm, outlen = tok_lm_from_walk(w)
        esets.append((tok_lm, outlen, w["win"]))

    def s_ex2(tok_lm, outlen, halo):
        ta = wk.annotate_lit_runs(tok_lm)
        return ex2.expand_tokens(ta, outlen, halo, oc)
    t = measure_cycled(esets, s_ex2, iters=4)
    table["decode_expand_v3"] = {"ms": round(t * 1e3, 3),
                                 "GBps": round(oc / t / 1e9, 3)}
    try:
        from jdeflate_tpu.ops import expand5 as ex5

        def s_ex5(tok_lm, outlen, halo):
            return ex5.expand_tokens(tok_lm, outlen, halo, oc)
        t = measure_cycled(esets, s_ex5, iters=4)
        table["decode_expand_v5"] = {"ms": round(t * 1e3, 3),
                                     "GBps": round(oc / t / 1e9, 3)}
    except Exception as e:
        table["decode_expand_v5"] = {"error": repr(e)[:120]}

    # checksums (device), 8 MB input
    n = len(data)
    carr = [jnp.asarray(np.frombuffer(data, np.uint8)),
            jnp.asarray(np.frombuffer(bytes(d2), np.uint8))]
    for name, fn in [("crc32", lambda a: cs._crc32_device(
            a, jnp.uint32(0), jnp.uint32(n))),
            ("adler32", lambda a: cs._adler32_device(
            a, jnp.uint32(1), jnp.uint32(n)))]:
        try:
            t = measure_cycled([(carr[0],), (carr[1],)], fn, iters=4)
            table[name] = {"ms": round(t * 1e3, 3),
                           "GBps": round(n / t / 1e9, 3)}
        except Exception as e:
            table[name] = {"error": repr(e)[:120]}

    # encoder stage budget (one batch segment; cumulative taps)
    if enc_calls[0] is not None:
        bl, batch, level, nw, fixed = enc.call_statics
        seg = bl * batch
        prev = 0.0
        for st in ["match", "walk", "entropy", "stored", "pack", ""]:
            fn = jax.jit(functools.partial(
                De.encode_batch_impl, bl=bl, batch=batch, level=level,
                num_words=nw, fixed_codes=fixed, stage=st))
            try:
                t = measure_cycled(enc_calls, fn, iters=3)
            except Exception as e:
                table["encode_" + (st or "full")] = {"error": repr(e)[:120]}
                continue
            table["encode_" + (st or "full")] = {
                "ms": round(t * 1e3, 3),
                "delta_ms": round((t - prev) * 1e3, 3),
                "GBps": round(seg / t / 1e9, 4)}
            prev = t
    return table


def main():
    # persistent compile cache speeds later rounds
    cache = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jdeflate_tpu.codec.deflate import RawDeflater
    from jdeflate_tpu.codec.inflate import RawInflater
    from jdeflate_tpu.stream import zstrm

    t_start = time.perf_counter()
    n = CORPUS_MB << 20
    data = make_corpus(n)
    oracle = build_oracle()

    bl, batch = 1 << 16, 16
    enc = RawDeflater(level=LEVEL, block_size=bl, batch=batch)
    dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                      max_batch_out=1 << 23)

    # warmup (compile): one full untimed pass — the run's own bucket shapes
    # are what get compiled, so the timed pass below is steady-state
    raw_w, idx_w = enc.compress(data)
    dec.decompress(raw_w, index=idx_w)

    # best-of-3 wall times: the axon tunnel's sync-dispatch variance made
    # single-shot headlines a coin flip (BENCH_r02 vs builder runs differed
    # 3x on identical code); best-of-3 both tightens and reproduces
    enc_s = dec_s = float("inf")
    raw = index = out = None
    # BENCH_PROFILE=1 captures a jax.profiler trace of one timed pass
    # (VERDICT r4 #8: profiler-grade observability) into .profile/
    prof_ctx = None
    if os.environ.get("BENCH_PROFILE") == "1":
        prof_dir = os.path.join(REPO, ".profile")
        jax.profiler.start_trace(prof_dir)
        prof_ctx = prof_dir
    for _ in range(3):
        t0 = time.perf_counter()
        raw, index = enc.compress(data)
        enc_s = min(enc_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = dec.decompress(raw, index=index)
        dec_s = min(dec_s, time.perf_counter() - t0)
        if prof_ctx:
            jax.profiler.stop_trace()
            prof_ctx = None

    ok = out == data

    details = {
        "corpus_bytes": n,
        "level": LEVEL,
        "encode_GBps": n / enc_s / 1e9,
        "decode_GBps": n / dec_s / 1e9,
        "encode_s": enc_s,
        "decode_s": dec_s,
        "compressed_bytes": len(raw),
        "ratio": n / len(raw),
        "roundtrip_exact": ok,
        "backend": jax.devices()[0].platform,
    }

    # ---- true device-compute times (distinct-input cycling harness; see
    # scripts/devtime.py — block_until_ready is unreliable on this backend
    # and loop-invariant stages get hoisted, so inputs must genuinely vary)
    if jax.default_backend() != "cpu" and not SKIP_EXTRA:
        try:
            details.update(_device_times(data, enc, dec, n))
        except Exception as e:
            details["device_time_error"] = repr(e)
        try:
            # per-kernel GB/s table (VERDICT r4 #8)
            details["kernel_table"] = _kernel_table(data, enc, dec)
        except Exception as e:
            details["kernel_table"] = {"error": repr(e)}
        try:
            # tunnel transfer rates + wall accounting (VERDICT r3 ask #3:
            # wall vs device + transfer, both printed)
            import jax.numpy as jnp
            # fresh arrays each read: jax caches host copies, so re-reading
            # the same buffer measures nothing
            pw = (jnp.arange(4 << 20, dtype=jnp.int32) & 0xFF).astype(
                jnp.uint8)
            np.asarray(pw)                          # warm the path
            p2 = ((jnp.arange(4 << 20, dtype=jnp.int32) + 7) & 0xFF).astype(
                jnp.uint8)
            int(p2[0])                              # force materialization
            t0 = time.perf_counter()
            np.asarray(p2)
            d2h = (4 << 20) / max(time.perf_counter() - t0, 1e-9)
            hb = np.ones(4 << 20, np.uint8)
            t0 = time.perf_counter()
            int(jnp.asarray(hb)[0])                 # upload + sync
            h2d = (4 << 20) / max(time.perf_counter() - t0, 1e-9)
            xfer_s = n / d2h + len(raw) / h2d
            acct = {
                "tunnel_d2h_MBps": round(d2h / 1e6, 1),
                "tunnel_h2d_MBps": round(h2d / 1e6, 1),
                "transfer_est_s": round(xfer_s, 3),
                "wall_s": round(dec_s, 3),
            }
            if "decode_device_ms" in details:       # else leave unattributed
                dev_s = (details["decode_device_ms"] / 1e3
                         * -(-n // details["decode_device_batch_out"]))
                acct["device_sum_s"] = round(dev_s, 3)
                acct["wall_over_device_plus_transfer"] = round(
                    (dev_s + xfer_s) / dec_s, 3) if dec_s else None
            details["decode_wall_accounting"] = acct
        except Exception as e:
            details["transfer_probe_error"] = repr(e)

    if oracle:
        try:
            t0 = time.perf_counter()
            jd = oracle_size(oracle, data, LEVEL)
            details["jdeflate_encode_s"] = time.perf_counter() - t0
            details["jdeflate_bytes"] = len(jd)
            details["size_vs_jdeflate"] = len(raw) / len(jd)
            t0 = time.perf_counter()
            back = subprocess.run([oracle, "d"], input=jd,
                                  capture_output=True, timeout=600).stdout
            details["jdeflate_decode_s"] = time.perf_counter() - t0
            details["jdeflate_roundtrip"] = back == data
            # cross-decode: reference must decode our stream
            ours_by_jd = subprocess.run([oracle, "d"], input=raw,
                                        capture_output=True, timeout=600).stdout
            details["jdeflate_decodes_us"] = ours_by_jd == data
        except Exception as e:  # oracle failures must not kill the bench
            details["oracle_error"] = repr(e)

    # ---- per-config rows (BASELINE.json configs[0..4]) ----
    configs = {}
    if not SKIP_EXTRA:
        try:
            # configs[0]: level 1 fixed/greedy, 1 MB text, buffer mode
            text1 = make_corpus(4 << 20)[: 1 << 20]
            e1 = RawDeflater(level=1, block_size=bl, batch=16)
            r1, i1 = e1.compress(text1)
            ok1 = dec.decompress(r1, index=i1) == text1   # warm decode too
            t0 = time.perf_counter()
            r1, i1 = e1.compress(text1)
            row = {"encode_s": time.perf_counter() - t0,
                   "compressed": len(r1),
                   "roundtrip": ok1 and dec.decompress(r1, index=i1) == text1}
            if oracle:
                row["size_vs_jdeflate"] = len(r1) / len(
                    oracle_size(oracle, text1, 1))
            configs["level1_buffer"] = row
        except Exception as e:
            configs["level1_buffer"] = {"error": repr(e)}
        try:
            # configs[3]: level 9 max-effort ratio parity
            d9 = data[: 4 << 20]
            e9 = RawDeflater(level=9, block_size=bl, batch=16)
            r9, i9 = e9.compress(d9)
            ok9 = dec.decompress(r9, index=i9) == d9      # warm decode too
            t0 = time.perf_counter()
            r9, i9 = e9.compress(d9)
            row = {"encode_s": time.perf_counter() - t0,
                   "compressed": len(r9),
                   "roundtrip": ok9 and dec.decompress(r9, index=i9) == d9}
            if oracle:
                row["size_vs_jdeflate"] = len(r9) / len(
                    oracle_size(oracle, d9, 9))
            configs["level9_ratio"] = row
        except Exception as e:
            configs["level9_ratio"] = {"error": repr(e)}
        try:
            # configs[2]: zlib + gzip framing with checksum verification
            dz = data[: 2 << 20]
            t0 = time.perf_counter()
            gz = zstrm.compress(dz, format="gzip", level=6)
            okg = zstrm.decompress(gz) == dz        # verifies CRC32+ISIZE
            zl = zstrm.compress(dz, format="zlib", level=6)
            okz = zstrm.decompress(zl) == dz        # verifies adler32
            import gzip as _g, zlib as _z
            configs["framed_zstrm"] = {
                "gzip_ok": okg and _g.decompress(gz) == dz,
                "zlib_ok": okz and _z.decompress(zl) == dz,
                "wall_s": time.perf_counter() - t0}
        except Exception as e:
            configs["framed_zstrm"] = {"error": repr(e)}
        try:
            # foreign-stream decode (VERDICT r4 #5): a zlib-produced stream
            # through build_index (native sequential pass) + the anchored
            # device path — the conformance story's throughput, measured.
            import zlib as _z2
            df = data[: 4 << 20]
            co = _z2.compressobj(6, _z2.DEFLATED, -15)
            fraw = co.compress(df) + co.flush()
            t0 = time.perf_counter()
            fidx = dec.build_index(fraw)
            idx_s = time.perf_counter() - t0
            outf = dec.decompress(fraw, index=fidx)     # warm/compile
            okf = outf == df
            t0 = time.perf_counter()
            outf = dec.decompress(fraw, index=fidx)
            dec_f = time.perf_counter() - t0
            kinds = [k for k, _, e in dec.last_stats]
            errs = sum(e for _, _, e in dec.last_stats)
            configs["foreign_zlib"] = {
                "bytes": len(df), "compressed": len(fraw),
                "roundtrip": okf and outf == df,
                "index_s": round(idx_s, 4),
                "index_GBps": round(len(df) / idx_s / 1e9, 4),
                "decode_s": round(dec_f, 4),
                "decode_GBps": round(len(df) / dec_f / 1e9, 4),
                "end_to_end_GBps": round(len(df) / (idx_s + dec_f) / 1e9, 4),
                "device_dispatches": kinds.count("win"),
                "dispatch_errs": int(errs),
            }
        except Exception as e:
            configs["foreign_zlib"] = {"error": repr(e)}
        try:
            # configs[4] proxy: sharded members scaling on an 8-virtual-device
            # CPU mesh (subprocess; this host has 2 cores, so wall-clock
            # efficiency is core-bound — the collective traffic per shard is
            # the honest scaling argument: 4*D bytes of all-gathered lengths
            # vs megabytes of independent compute).
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts",
                                              "scaling_probe.py")],
                capture_output=True, timeout=900,
                env={**os.environ, "JAX_PLATFORMS": "cpu",
                     "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
            configs["sharded_members"] = json.loads(
                r.stdout.decode().strip().splitlines()[-1])
        except Exception as e:
            configs["sharded_members"] = {"error": repr(e)}
    details["configs"] = configs
    details["bench_wall_s"] = time.perf_counter() - t_start

    with open(os.path.join(REPO, "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)

    value = details["decode_GBps"] if ok else 0.0
    # headline = wall GB/s (transfer-bound on the axon tunnel, see module
    # docstring); device-compute GB/s rides along so both are in the driver
    # record (VERDICT r2 item 2)
    print(json.dumps({
        "metric": "decode_GBps_level%d_silesia_like" % LEVEL,
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / 2.0, 4),
        "decode_device_GBps": details.get("decode_device_GBps"),
        "encode_device_GBps": details.get("encode_device_GBps"),
        "size_vs_jdeflate": details.get("size_vs_jdeflate"),
    }))


if __name__ == "__main__":
    main()
