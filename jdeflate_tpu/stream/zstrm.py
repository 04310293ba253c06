"""High-level stream layer: the TPU-native analog of the reference's zstrm.

Reference behavior reproduced (jdeflate src/zstrm.c): modes inflate/deflate
with raw/zlib/gzip framing (zstrm.h:37-49), first-byte format autodetection
against an accepted-format mask (parsehead, zstrm.c:567-624), the zlib FDICT
preset-dictionary protocol with adler32 id verification (zstrm_setdctnr,
zstrm.c:326-390), checksum verification on decode (checkgziptail /
checkzlibtail, zstrm.c:626-693), latched poisoned-error state
(state 0xDEADBEEF, zstrm.c:255-261), and produced/consumed counters.

Architecture change (TPU-first): instead of a byte-resumable callback pump,
the stream layer drives the block-batch device codecs; suspension granularity
is the block batch, and sync-flush seams (deflator.h:135-141) are the
checkpoint/restart points. Checksums run as device reductions (ops.checksum).
"""
from __future__ import annotations

from ..codec.deflate import RawDeflater
from ..codec.inflate import RawInflater
from ..formats import headers as H
from ..ops import checksum as cs
from ..utils import errors

_FORMATS = ("raw", "zlib", "gzip")


def compress(data: bytes, format: str = "gzip", level: int = 6,
             dictionary: bytes | None = None, block_size: int = 1 << 16,
             batch: int = 16, fixed_codes: bool = False,
             embed_index: bool = False) -> bytes:
    """One-shot framed compression. Returns the complete framed stream.

    embed_index=True (gzip only) stores the parallel-decode index in a
    FEXTRA subfield (RFC 1952 §2.3.1.1) so decompress() runs the windowed
    device path with no in-memory index handoff; foreign decoders skip the
    field. Costs ~18% of the compressed size (one 6-bit window anchor per
    32 stream bits), so it is opt-in — the in-memory index from
    compress_with_index() is free.
    """
    if format not in _FORMATS:
        raise errors.IncorrectUseError(f"unknown format {format!r}")
    if format == "gzip" and dictionary:
        raise errors.IncorrectUseError("gzip framing has no dictionary field")
    enc = RawDeflater(level=level, block_size=block_size, batch=batch,
                      fixed_codes=fixed_codes)
    raw, index = enc.compress(data, dictionary=dictionary)
    if format == "raw":
        return raw
    if format == "gzip":
        if embed_index:
            index["clen"] = len(raw)
            hdr = H.emit_gzip_header_with_extra(H.pack_index(index))
        else:
            hdr = H.emit_gzip_header()
        return (hdr + raw
                + H.emit_gzip_trailer(cs.crc32(data), len(data)))
    dictid = cs.adler32(dictionary) if dictionary else None
    return (H.emit_zlib_header(level, dictid) + raw
            + H.emit_zlib_trailer(cs.adler32(data)))


def compress_with_index(data: bytes, format: str = "gzip", level: int = 6,
                        dictionary: bytes | None = None,
                        block_size: int = 1 << 16, batch: int = 16):
    """Like compress() but also returns the parallel-decode block index."""
    if format not in _FORMATS:
        raise errors.IncorrectUseError(f"unknown format {format!r}")
    enc = RawDeflater(level=level, block_size=block_size, batch=batch)
    raw, index = enc.compress(data, dictionary=dictionary)
    if format == "raw":
        return raw, index, 0
    if format == "gzip":
        hdr = H.emit_gzip_header()
        out = hdr + raw + H.emit_gzip_trailer(cs.crc32(data), len(data))
    else:
        dictid = cs.adler32(dictionary) if dictionary else None
        hdr = H.emit_zlib_header(level, dictid)
        out = hdr + raw + H.emit_zlib_trailer(cs.adler32(data))
    return out, index, len(hdr)


def _partial_inflate_py(buf: bytes, window: bytes, start_bit: int):
    """Pure-Python partial inflate (native-unavailable fallback): decode
    complete blocks, stop at truncation. Returns (out, end_bit, complete)."""
    from . import host_inflate as hi
    from ..utils.errors import InputEndError
    out = bytearray()
    win = window
    pos = start_bit
    while True:
        try:
            piece, endpos, bfinal = hi.inflate_one_block(buf, pos, win)
        except InputEndError:
            return bytes(out), pos, False
        out += piece
        win = (win + piece)[-32768:]
        pos = endpos
        if bfinal:
            return bytes(out), pos, True


def _seq_inflate(body: bytes, dictionary: bytes = b""):
    """Sequential one-pass decode of a raw stream -> (out, end_bit)."""
    from . import host_inflate as hi
    from . import native
    if native.available():
        out, _, endbit = native.inflate(body, dictionary)
    else:
        out, _, endbit = hi.inflate_raw(body, dictionary)
    return out, endbit


def decompress(data: bytes, format: str = "auto",
               dictionary: bytes | None = None, verify: bool = True,
               index=None, header_len: int | None = None) -> bytes:
    """One-shot framed decompression with checksum verification.

    format: 'auto' accepts any of raw/zlib/gzip by first-byte detection
    (reference default for inflate, zstrm.c:93-98); or one of the three.
    index/header_len: optional parallel-decode index (bit offsets relative to
    the raw deflate body) as returned by compress_with_index.
    gzip inputs may contain multiple members (RFC 1952 §2.2) — all are
    decoded and concatenated, each trailer verified.
    """
    accepted = set(_FORMATS) if format == "auto" else {format}
    if format not in _FORMATS + ("auto",):
        raise errors.IncorrectUseError(f"unknown format {format!r}")
    if not data:
        raise errors.InputEndError("empty stream")
    fmt = H.detect_format(data[0], accepted)

    dec = RawInflater()
    if fmt == "raw":
        return dec.decompress(data, index=index, dictionary=dictionary or b"")

    if fmt == "gzip":
        hl = H.parse_gzip_header(data)
        if index is not None:
            # single member produced by compress_with_index
            if header_len not in (None, hl):
                raise errors.IncorrectUseError("index/header mismatch")
            out = dec.decompress(data[hl:], index=index)
            if verify:
                H.check_gzip_trailer(data[-8:], cs.crc32(out), len(out))
            return out
        # multi-member loop (RFC 1952 §2.2); members carrying an embedded
        # FEXTRA index (compress(embed_index=True)) take the windowed
        # device path with no sequential decode
        out = bytearray()
        pos = 0
        while True:
            hl = H.parse_gzip_header(data[pos:])
            body = data[pos + hl:]
            emb = H.unpack_index(
                H.parse_gzip_extra(data[pos:pos + hl + 4]) or b"")
            if emb is not None and emb.get("clen"):
                nbytes = emb["clen"]
                o = dec.decompress(body[:nbytes], index=emb)
            else:
                o, endbit = _seq_inflate(body)
                nbytes = (endbit + 7) // 8
            if verify:
                H.check_gzip_trailer(body[nbytes:nbytes + 8],
                                     cs.crc32(o), len(o))
            elif len(body) < nbytes + 8:
                raise errors.InputEndError("truncated gzip trailer")
            out += o
            pos += hl + nbytes + 8
            if pos >= len(data) or data[pos:pos + 2] != b"\x1f\x8b":
                break
        return bytes(out)

    hl, dictid = H.parse_zlib_header(data)
    if dictid is not None:
        if dictionary is None:
            raise errors.MissingDictError("stream requires a preset dictionary")
        if cs.adler32(dictionary) != dictid:
            raise errors.BadDictError("dictionary id mismatch")
    body = data[hl:]
    out = dec.decompress(body, index=index, dictionary=dictionary or b"")
    if verify:
        H.check_zlib_trailer(data[-4:], cs.adler32(out))
    return out


class ZStream:
    """Incremental framed stream codec (reference zstrm object analog).

    Deflate side: write(data) buffers input; whole block-batches are encoded
    as they fill; flush(final=True) terminates the stream (BFINAL + trailer),
    flush(final=False) emits a byte-aligned sync-flush seam
    (Z_SYNC_FLUSH / DEFLT_FLUSH semantics).

    Inflate side: feed(data) decodes complete gzip members incrementally
    (member-granularity streaming; RFC 1952 §2.2 multi-member concatenation);
    zlib/raw streams decode at finish(). read() takes decoded output;
    used_input / unused_data report trailing-data accounting (the reference's
    usedinput, zstrm.c:888-908). Byte-granular suspension is intentionally
    not reproduced — suspension is at member/block granularity on TPU.

    Errors latch: any failure poisons the stream (reference state 0xDEADBEEF).
    """

    def __init__(self, mode: str, format: str = "gzip", level: int = 6,
                 dictionary: bytes | None = None, block_size: int = 1 << 16,
                 batch: int = 16, checksum: str = "auto",
                 source_fn=None, target_fn=None):
        if mode not in ("deflate", "inflate"):
            raise errors.IncorrectUseError("mode must be 'deflate' or 'inflate'")
        if mode == "deflate" and format == "auto":
            raise errors.IncorrectUseError("deflate requires a concrete format")
        if checksum not in ("auto", "force", "suppress"):
            # reference checksum flags: ZSTRM_DOCRC32/DOADLER32 force,
            # ZSTRM_NOCRC32/NOADLER32 suppress (zstrm.h:53-61)
            raise errors.IncorrectUseError(
                "checksum must be 'auto', 'force' or 'suppress'")
        self.mode = mode
        self.format = format
        self.level = level
        self.dictionary = dictionary
        self.block_size = block_size
        self.batch = batch
        self.checksum_mode = checksum
        # IO callback plumbing (reference TZStrmIFn/TZStrmOFn pull/push pair,
        # zstrm.h:92-101): source_fn(nbytes)->bytes (b'' = end of input),
        # target_fn(bytes)->None
        self.source_fn = source_fn
        self.target_fn = target_fn
        self.reset()

    def reset(self):
        """Reset for reuse with the same configuration (zstrm_reset analog,
        /root/reference/src/zstrm.c create/reset/destroy triple). Clears any
        latched error."""
        self._buf = bytearray()
        self._out = bytearray()
        self._started = False
        self._finished = False
        self._poisoned = False
        self.total_in = 0
        self.total_out = 0
        self.used_input = 0       # consumed compressed bytes (inflate side;
        self.unused_data = b""    # reference usedinput, zstrm.c:888-908)
        self._crc = 0
        self._adler = 1
        self._pending_tail = bytearray()  # encoded-but-unflushed member body
        self._segments_tail = None
        self._ist = {"stage": "head"}     # incremental-inflate state
        return self

    @property
    def crc32(self) -> int:
        """Running CRC32 of the uncompressed data seen so far. Always
        maintained under checksum='force' (ZSTRM_DOCRC32 analog,
        zstrm.h:53-61, 124-125); under 'auto' only when the framing uses it."""
        return self._crc

    @property
    def adler32(self) -> int:
        """Running adler32 of the uncompressed data (ZSTRM_DOADLER32
        analog)."""
        return self._adler

    def _track(self, data: bytes):
        """Update exposed checksums for uncompressed bytes."""
        force = self.checksum_mode == "force"
        if force or self.format == "gzip":
            self._crc = cs.crc32(data, self._crc)
        if force or self.format == "zlib":
            self._adler = cs.adler32(data, self._adler)

    def _check(self):
        if self._poisoned:
            raise errors.StreamPoisonedError("stream previously errored")

    def _start_if_needed(self):
        if self._started:
            return
        self._started = True
        if self.format == "gzip":
            if self.dictionary:
                self._poisoned = True
                raise errors.IncorrectUseError("gzip has no dictionary field")
            self._emit(H.emit_gzip_header())
        elif self.format == "zlib":
            dictid = cs.adler32(self.dictionary) if self.dictionary else None
            self._emit(H.emit_zlib_header(self.level, dictid))

    def _emit(self, b: bytes):
        if self.target_fn is not None:
            self.target_fn(bytes(b))
        else:
            self._out += b
        self.total_out += len(b)

    def write(self, data: bytes):
        """Buffer input; encodes eagerly in sync-flushed segments."""
        self._check()
        if self.mode != "deflate":
            self._poisoned = True
            raise errors.IncorrectUseError("write() on an inflate stream")
        if self._finished:
            self._poisoned = True
            raise errors.IncorrectUseError("write() after final flush")
        self._start_if_needed()
        self._buf += data
        self.total_in += len(data)
        self._track(data)
        seg = self.block_size * self.batch
        while len(self._buf) >= seg:
            chunk = bytes(self._buf[:seg])
            del self._buf[:seg]
            self._encode_segment(chunk, final=False)

    def _encode_segment(self, chunk: bytes, final: bool):
        enc = RawDeflater(level=self.level, block_size=self.block_size,
                          batch=self.batch)
        raw, _ = enc.compress(chunk, dictionary=self._segment_dict(),
                              final=final)
        if chunk:
            self._segments_tail = chunk[-32768:]
        self._emit(raw)

    def _segment_dict(self):
        d = getattr(self, "_segments_tail", None)
        if d is None:
            return self.dictionary
        return d

    def flush(self, final: bool = True) -> bytes:
        """Flush buffered input. final=True ends the stream with the trailer."""
        self._check()
        if self.mode != "deflate":
            self._poisoned = True
            raise errors.IncorrectUseError("flush() on an inflate stream")
        self._start_if_needed()
        if final and self._finished:
            return self.read()
        chunk = bytes(self._buf)
        self._buf.clear()
        if chunk or final:
            self._encode_segment(chunk, final=final)
        if final:
            self._finished = True
            if self.format == "gzip":
                self._emit(H.emit_gzip_trailer(self._crc, self.total_in))
            elif self.format == "zlib":
                self._emit(H.emit_zlib_trailer(self._adler))
        return self.read()

    # ---- inflate side ----

    def feed(self, data: bytes) -> None:
        """Buffer compressed input; complete DEFLATE blocks decode as they
        arrive (the reference's incremental inflate drive, zstrm.c:792-958,
        at block granularity instead of bytes), so memory stays bounded by
        the feed chunk size plus one block, even inside a multi-gigabyte
        single member. Decoded output accumulates; take it with read() or
        at finish()."""
        self._check()
        if self.mode != "inflate":
            self._poisoned = True
            raise errors.IncorrectUseError("feed() on a deflate stream")
        self._buf += data
        self.total_in += len(data)
        try:
            self._drain_stream(final=False)
        except errors.JDeflateError:
            self._poisoned = True
            raise

    def _inflate_fmt(self):
        accepted = set(_FORMATS) if self.format == "auto" else {self.format}
        return H.detect_format(self._buf[0], accepted)

    def _verify(self) -> bool:
        return self.checksum_mode != "suppress"

    def _drain_stream(self, final: bool):
        """Incremental decode state machine over the buffered input.

        Stages: head -> body (block-at-a-time via the native partial
        inflator) -> trailer -> (gzip: next member | done). The 32 KiB
        window carries across calls exactly like the reference's ring
        (updatewindow, src/inflator.c:616-675).
        """
        from . import native
        if self._finished:
            return
        st = self._ist
        while True:
            if st["stage"] == "head":
                if not self._buf:
                    return
                fmt = self._inflate_fmt()
                if fmt == "gzip":
                    try:
                        hl = H.parse_gzip_header(bytes(self._buf))
                    except errors.InputEndError:
                        return
                elif fmt == "zlib":
                    try:
                        hl, dictid = H.parse_zlib_header(bytes(self._buf))
                    except errors.InputEndError:
                        return
                    if dictid is not None:
                        if self.dictionary is None:
                            raise errors.MissingDictError(
                                "stream requires a preset dictionary")
                        if cs.adler32(self.dictionary) != dictid:
                            raise errors.BadDictError(
                                "dictionary id mismatch")
                else:
                    hl = 0
                del self._buf[:hl]
                self.used_input += hl
                st.update(stage="body", fmt=fmt, bit=0,
                          win=(self.dictionary or b"")[-32768:]
                          if fmt != "gzip" else b"",
                          mcrc=0, madler=1, mlen=0)
            elif st["stage"] == "body":
                if not self._buf:
                    return
                buf = bytes(self._buf)
                if native.available():
                    o, endbit, complete = native.inflate_partial(
                        buf, st["win"], st["bit"])
                else:
                    o, endbit, complete = _partial_inflate_py(
                        buf, st["win"], st["bit"])
                if o:
                    st["win"] = (st["win"] + o)[-32768:]
                    st["mcrc"] = cs.crc32(o, st["mcrc"])
                    st["madler"] = cs.adler32(o, st["madler"])
                    st["mlen"] += len(o)
                    self._track(o)
                    self._push_out(o)
                    self.total_out += len(o)
                consumed = endbit >> 3
                del self._buf[:consumed]
                self.used_input += consumed
                st["bit"] = endbit & 7
                if not complete:
                    return
                # stream ended: consume the final partial byte
                if st["bit"]:
                    del self._buf[:1]
                    self.used_input += 1
                    st["bit"] = 0
                st["stage"] = "trailer"
            elif st["stage"] == "trailer":
                fmt = st["fmt"]
                if fmt == "gzip":
                    if len(self._buf) < 8:
                        if final:
                            raise errors.InputEndError(
                                "truncated gzip trailer")
                        return
                    if self._verify():
                        H.check_gzip_trailer(bytes(self._buf[:8]),
                                             st["mcrc"], st["mlen"])
                    del self._buf[:8]
                    self.used_input += 8
                    # another member? (RFC 1952 §2.2)
                    if len(self._buf) >= 2 \
                            and bytes(self._buf[:2]) == H.GZIP_MAGIC:
                        st["stage"] = "head"
                        continue
                    if len(self._buf) < 2 and not final:
                        st["stage"] = "head"   # more members may arrive
                        return
                    st["stage"] = "done"
                elif fmt == "zlib":
                    if len(self._buf) < 4:
                        if final:
                            raise errors.InputEndError(
                                "truncated zlib trailer")
                        return
                    if self._verify():
                        H.check_zlib_trailer(bytes(self._buf[:4]),
                                             st["madler"])
                    del self._buf[:4]
                    self.used_input += 4
                    st["stage"] = "done"
                else:
                    st["stage"] = "done"
            elif st["stage"] == "done":
                self.unused_data += bytes(self._buf)
                self._buf.clear()
                return

    def _push_out(self, o: bytes):
        """Deliver decoded output (inflate side): push callback or buffer."""
        if self.target_fn is not None:
            self.target_fn(bytes(o))
        else:
            self._out += o

    def read(self) -> bytes:
        """Take decoded-so-far output (inflate) or encoded output (deflate)."""
        out = bytes(self._out)
        self._out.clear()
        return out

    def run(self, chunk_size: int = 1 << 16) -> bytes:
        """Drive the stream from source_fn to completion (the reference's
        callback-pump usage pattern: zstrm_setsourcefn + settargetfn,
        zstrm.h:92-101). Pulls chunk_size bytes per call until source_fn
        returns b''; returns any non-callback output."""
        self._check()
        if self.source_fn is None:
            raise errors.IncorrectUseError("run() requires source_fn")
        while True:
            data = self.source_fn(chunk_size)
            if not data:
                break
            if self.mode == "deflate":
                self.write(data)
            else:
                self.feed(data)
        if self.mode == "deflate":
            return self.flush(final=True)
        return self.finish()

    def finish(self) -> bytes:
        """Decode everything fed so far and verify trailers (inflate mode).

        Suspension granularity is the member/block batch on TPU (SURVEY.md
        §5): gzip members decode incrementally in feed(); zlib/raw streams
        decode here. Trailing non-stream bytes are preserved in unused_data
        with used_input accounting (reference usedinput, zstrm.c:888-908).
        """
        self._check()
        if self.mode != "inflate":
            self._poisoned = True
            raise errors.IncorrectUseError("finish() on a deflate stream")
        if self._finished:
            return self.read()
        try:
            self._drain_stream(final=True)
            st = self._ist
            if st["stage"] == "body":
                raise errors.InputEndError("truncated deflate stream")
            if st["stage"] == "head" and (self._buf or not self.used_input):
                if self.used_input and bytes(self._buf[:2]) == H.GZIP_MAGIC:
                    raise errors.InputEndError("truncated gzip member")
                if not self.used_input and self._buf:
                    raise errors.InputEndError("truncated stream header")
                self.unused_data = bytes(self._buf)
                self._buf.clear()
            if st["stage"] == "trailer":
                raise errors.InputEndError("truncated stream trailer")
        except errors.JDeflateError:
            self._poisoned = True
            raise
        self._finished = True
        return self.read()
