"""Data-parallel sharded compression over a device mesh (shard_map).

Design (SURVEY.md §2.5, BASELINE north star): the input splits into per-chip
shards; every chip runs the full block-parallel encode pipeline on its shard
with no cross-chip traffic during compute (the DEFLATE window bound makes
shards independent). The collectives are exactly the ones the format needs:

  (a) per-shard compressed bit lengths all-gathered ('dp' axis, ICI),
  (b) exclusive scan of lengths -> member offsets (tiny, replicated),
  (c) ordered gather of the variable-length members (host-side collect of the
      sharded words array — DCN/PCIe path; a fixed-capacity padded
      all-gather alternative is bandwidth-wasteful at these sizes),
  (d) checksums combined in log-depth with the GF(2)/adler algebra
      (ops.checksum.crc32_combine / adler32_combine; the algebra the
      reference ships as crc32_ncombine, src/zstrm.c:1427-1443).

Two output modes:
  members: each chip emits a complete gzip member; concatenated members form
    a valid multi-member gzip file (RFC 1952 §2.2) — decode is also
    embarrassingly parallel.
  stream: one deflate stream; shard k sees shard k-1's 32 KiB tail as a
    preset-dictionary halo (better ratio; serial window for foreign decoders,
    still block-parallel for ours).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..codec import deflate as De
from ..codec.inflate import RawInflater
from ..formats import headers as H
from ..ops import checksum as cs
from .mesh import DP_AXIS, make_mesh

HALO = De.HALO
PAD = De.PAD


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "bl", "bpd", "level", "num_words"))
def encode_sharded(data_sh, shard_lens, dict_lens, final_blocks,
                   mesh, bl: int, bpd: int, level: int, num_words: int):
    """Encode all shards in parallel under shard_map.

    data_sh: (D, HALO + bpd*bl + PAD) u8, sharded over 'dp'.
    shard_lens/dict_lens/final_blocks: (D,) i32 (final_blocks: per-shard index
      of the BFINAL block, or -1).
    Returns (words (D, num_words) u32, totals (D,) i32, per_block (D, bpd),
    all_lens (D, D) — each shard's view of the all-gathered lengths).
    """

    def body(d, n, dl, fin):
        (words, total, per_block, _, start_f, hdr_off, gwin,
         wanch, stored) = De.encode_batch_impl(
            d[0], jnp.int32(0), n[0], dl[0], fin[0],
            bl, bpd, level, num_words)
        # (a) all-gather per-shard bit lengths over ICI
        lens = jax.lax.all_gather(total, DP_AXIS)
        return (words[None], total[None], per_block[None], lens[None],
                start_f[None].astype(jnp.int32), hdr_off[None],
                gwin[None], wanch[None], stored[None].astype(jnp.int32))

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(DP_AXIS, None), P(DP_AXIS), P(DP_AXIS, None),
                   P(DP_AXIS, None), P(DP_AXIS, None, None),
                   P(DP_AXIS, None, None), P(DP_AXIS, None, None),
                   P(DP_AXIS, None, None),
                   P(DP_AXIS, None)),
        check_vma=False)(data_sh, shard_lens, dict_lens, final_blocks)


@functools.partial(jax.jit, static_argnames=("mesh", "shard_cap"))
def checksums_sharded(data_sh, shard_lens, mesh, shard_cap: int):
    """Per-shard crc32/adler32 as device reductions under shard_map."""

    def body(d, n):
        shard = d[0, HALO:HALO + shard_cap]
        # the raw-CRC chunk scan needs FRONT zero padding (invisible to a
        # zero-init recurrence); adler wants trailing zeros (weightless)
        fronted = jnp.roll(shard, shard_cap - n[0])
        crc = cs._crc32_device(fronted, jnp.uint32(0), n[0].astype(jnp.uint32))
        adl = cs._adler32_device(shard, jnp.uint32(1), n[0].astype(jnp.uint32))
        return crc[None], adl[None]

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(DP_AXIS)),
        out_specs=(P(DP_AXIS), P(DP_AXIS)),
        check_vma=False,
    )(data_sh, shard_lens)


class ShardedDeflater:
    """Host driver for mesh-parallel compression."""

    def __init__(self, mesh=None, level: int = 6, block_size: int = 1 << 16,
                 blocks_per_device: int = 8, mode: str = "members",
                 verify: bool = False):
        if mode not in ("members", "stream"):
            raise ValueError(mode)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.level = level
        self.bl = block_size
        self.bpd = blocks_per_device
        self.mode = mode
        # Elastic recovery (SURVEY §5): shards are independent, so a failed
        # shard's range can be re-encoded alone and spliced in. verify=True
        # decodes every shard against its source bytes after readback (the
        # failure detector); a failed shard is retried host-side.
        self.verify = verify
        # test seam: fault_hook(k, seg_bytes) -> seg_bytes (possibly
        # corrupted) lets tests kill one shard's result
        self.fault_hook = None
        self.retries: list = []

    def _shard_ok(self, seg_bytes: bytes, src: np.ndarray, s: int,
                  ln: int) -> bool:
        """Failure detector: the shard's compressed bytes must decode back
        to its exact source range."""
        from ..stream import host_inflate as hi
        from ..stream import native
        window = src[max(0, s - HALO):s].tobytes()
        try:
            if native.available():
                out, _, _ = native.inflate(seg_bytes, window,
                                           out_cap=max(ln, 1 << 12))
            else:
                out, _, _ = hi.inflate_raw(seg_bytes, window)
        except Exception:
            return False
        return out[:ln] == src[s:s + ln].tobytes()

    def _reencode_shard(self, src: np.ndarray, s: int, ln: int,
                        final: bool):
        """Retry path: re-encode one shard's range independently (members
        are independent; stream shards see the halo as a dictionary)."""
        enc = De.RawDeflater(level=self.level, block_size=self.bl,
                             batch=min(self.bpd, (ln + self.bl - 1)
                                       // self.bl) or 1)
        window = src[max(0, s - HALO):s].tobytes() \
            if self.mode == "stream" else b""
        body, index = enc.compress(src[s:s + ln].tobytes(),
                                   dictionary=window, final=final)
        return body, index

    @property
    def ndev(self) -> int:
        return self.mesh.devices.size

    def compress(self, data: bytes):
        """Returns (blob, info). members mode: multi-member gzip file.
        stream mode: single gzip stream with combined checksum."""
        bl, bpd, d = self.bl, self.bpd, self.ndev
        shard_bytes = bl * bpd
        n = len(data)
        arr = np.frombuffer(data, np.uint8)
        nw = De.words_bound(bl, bpd)

        out = bytearray()
        members = []
        crc_total, adler_total, done = 0, 1, 0
        pos = 0
        first_round = True
        while pos < n or (first_round and n == 0):
            first_round = False
            round_n = min(n - pos, d * shard_bytes)
            buf = np.zeros((d, HALO + shard_bytes + PAD), np.uint8)
            lens = np.zeros(d, np.int32)
            dls = np.zeros(d, np.int32)
            fins = np.full(d, -1, np.int32)
            for k in range(d):
                s = pos + k * shard_bytes
                ln = max(0, min(n - s, shard_bytes))
                lens[k] = ln
                if ln:
                    buf[k, HALO:HALO + ln] = arr[s:s + ln]
                if self.mode == "stream" and s > 0 and ln:
                    h = min(HALO, s)
                    buf[k, HALO - h:HALO] = arr[s - h:s]
                    dls[k] = h
                if ln and (self.mode == "members"
                           or s + ln >= n):
                    fins[k] = (ln - 1) // bl
            data_sh = jax.device_put(
                jnp.asarray(buf),
                jax.sharding.NamedSharding(self.mesh, P(DP_AXIS, None)))
            (words, totals, per_block, _, start_f, hdr_off, gwin,
             wanch, stored) = encode_sharded(
                data_sh, jnp.asarray(lens), jnp.asarray(dls),
                jnp.asarray(fins), self.mesh, bl, bpd, self.level, nw)
            crcs, adlers = checksums_sharded(
                data_sh, jnp.asarray(lens), self.mesh, shard_bytes)
            wh = np.asarray(words)
            th = np.asarray(totals)
            ch = np.asarray(crcs)
            ah = np.asarray(adlers)
            sf = np.asarray(start_f)
            ho = np.asarray(hdr_off)
            gw = np.asarray(gwin)
            an = np.asarray(wanch)
            st = np.asarray(stored)
            for k in range(d):
                ln = int(lens[k])
                if ln == 0:
                    continue
                s = pos + k * shard_bytes
                total = int(th[k])
                body = wh[k].view(np.uint8)
                final = done + ln >= n
                crc_k, adl_k = int(ch[k]), int(ah[k])
                if self.mode == "members":
                    seg_bytes = body[: (total + 7) // 8].tobytes()
                else:
                    seg_bytes = body[: (total + 7) // 8].tobytes() if final \
                        else (body[: (total + 3 + 7) // 8].tobytes()
                              + b"\x00\x00\xff\xff")
                if self.fault_hook is not None:
                    seg_bytes = self.fault_hook(k, seg_bytes)
                index = None
                if self.verify or self.fault_hook is not None:
                    probe = seg_bytes if (self.mode == "members" or final) \
                        else seg_bytes + b"\x03\x00"
                    if not self._shard_ok(probe, arr, s, ln):
                        # elastic retry: shards are independent — re-encode
                        # just this range and recompute its checksums
                        import zlib as _z
                        seg_bytes, index = self._reencode_shard(
                            arr, s, ln,
                            final=(self.mode == "members") or final)
                        sl = arr[s:s + ln].tobytes()
                        crc_k = _z.crc32(sl)
                        adl_k = _z.adler32(sl)
                        self.retries.append((s, ln))
                if self.mode == "members":
                    mstart = len(out)
                    hdr = H.emit_gzip_header()
                    out += hdr
                    out += seg_bytes
                    out += H.emit_gzip_trailer(crc_k, ln)
                    if index is None:
                        nblk = (ln + bl - 1) // bl
                        ib, iy, ia = De.index_entries_from_meta(
                            bl, bpd, sf[k], ho[k], gw[k], an[k], st[k], nblk,
                            ln, 0, 0)
                        index = {"block_bits": ib, "block_bytes": iy,
                                 "win": ia, "sync_points": [], "n": ln}
                    index["header_len"] = len(hdr)
                    members.append((mstart, len(out) - mstart, ln, index))
                else:
                    out += seg_bytes
                    crc_total = cs.crc32_combine(crc_total, crc_k, ln)
                    adler_total = cs.adler32_combine(adler_total, adl_k, ln)
                done += ln
            pos += d * shard_bytes
            if n == 0:
                break

        if self.mode == "members":
            if n == 0:
                out += H.emit_gzip_header() + b"\x03\x00" \
                    + H.emit_gzip_trailer(0, 0)
                members.append((0, len(out), 0))
            return bytes(out), {"mode": "members", "members": members, "n": n}
        body = bytes(out) if n else b"\x03\x00"
        blob = (H.emit_gzip_header() + body
                + H.emit_gzip_trailer(crc_total, n))
        return blob, {"mode": "stream", "n": n}


def decompress_members(blob: bytes, info=None) -> bytes:
    """Decode a (possibly multi-member) gzip file (RFC 1952 §2.2).

    With `info` from ShardedDeflater (per-member parallel-decode indexes),
    every member decodes through the anchored device path — the decode-side
    mirror of the sharded encode. Without info, falls back to the one-shot
    multi-member decoder (stream.zstrm.decompress).
    """
    if info and info.get("mode") == "members" and info.get("members"):
        dec = RawInflater()
        out = bytearray()
        for m in info["members"]:
            if len(m) >= 4 and isinstance(m[3], dict):
                mstart, mlen, ln, index = m
                hl = index["header_len"]
                body = blob[mstart + hl: mstart + mlen - 8]
                o = dec.decompress(body, index=index)
                H.check_gzip_trailer(blob[mstart + mlen - 8: mstart + mlen],
                                     cs.crc32(o), len(o))
                out += o
            else:
                mstart, mlen = m[0], m[1]
                from ..stream.zstrm import decompress as _d
                out += _d(blob[mstart:mstart + mlen], format="gzip")
        return bytes(out)
    from ..stream.zstrm import decompress as _d
    return _d(blob, format="gzip")
