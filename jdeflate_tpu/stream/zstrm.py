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
             batch: int = 16) -> bytes:
    """One-shot framed compression. Returns the complete framed stream."""
    if format not in _FORMATS:
        raise errors.IncorrectUseError(f"unknown format {format!r}")
    if format == "gzip" and dictionary:
        raise errors.IncorrectUseError("gzip framing has no dictionary field")
    enc = RawDeflater(level=level, block_size=block_size, batch=batch)
    raw, _ = enc.compress(data, dictionary=dictionary)
    if format == "raw":
        return raw
    if format == "gzip":
        return (H.emit_gzip_header() + raw
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


def decompress(data: bytes, format: str = "auto",
               dictionary: bytes | None = None, verify: bool = True,
               index=None, header_len: int | None = None) -> bytes:
    """One-shot framed decompression with checksum verification.

    format: 'auto' accepts any of raw/zlib/gzip by first-byte detection
    (reference default for inflate, zstrm.c:93-98); or one of the three.
    index/header_len: optional parallel-decode index (bit offsets relative to
    the raw deflate body) as returned by compress_with_index.
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
        body = data[hl:]
        if index is not None and header_len not in (None, hl):
            raise errors.IncorrectUseError("index/header mismatch")
        out = dec.decompress(body, index=index)
        if verify:
            H.check_gzip_trailer(data[-8:], cs.crc32(out), len(out))
        return out

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

    Inflate side: one-shot feed via decompress_all (byte-granular resumable
    decode is intentionally not reproduced — suspension is at block
    granularity on TPU; use the host referee for exotic streaming needs).

    Errors latch: any failure poisons the stream (reference state 0xDEADBEEF).
    """

    def __init__(self, mode: str, format: str = "gzip", level: int = 6,
                 dictionary: bytes | None = None, block_size: int = 1 << 16,
                 batch: int = 16):
        if mode not in ("deflate", "inflate"):
            raise errors.IncorrectUseError("mode must be 'deflate' or 'inflate'")
        if mode == "deflate" and format == "auto":
            raise errors.IncorrectUseError("deflate requires a concrete format")
        self.mode = mode
        self.format = format
        self.level = level
        self.dictionary = dictionary
        self.block_size = block_size
        self.batch = batch
        self._buf = bytearray()
        self._out = bytearray()
        self._started = False
        self._finished = False
        self._poisoned = False
        self.total_in = 0
        self.total_out = 0
        self._crc = 0
        self._adler = 1
        self._pending_tail = bytearray()  # encoded-but-unflushed member body

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
        if self.format == "gzip":
            self._crc = cs.crc32(data, self._crc)
        elif self.format == "zlib":
            self._adler = cs.adler32(data, self._adler)
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

    def read(self) -> bytes:
        out = bytes(self._out)
        self._out.clear()
        return out

    # ---- inflate side ----

    def feed(self, data: bytes):
        """Buffer compressed input (inflate mode)."""
        self._check()
        if self.mode != "inflate":
            self._poisoned = True
            raise errors.IncorrectUseError("feed() on a deflate stream")
        self._buf += data
        self.total_in += len(data)

    def finish(self) -> bytes:
        """Decode everything fed so far and verify trailers (inflate mode).

        Suspension granularity is the block batch on TPU (SURVEY.md §5): the
        byte-granular resumable decode of the reference is intentionally
        replaced by feed-then-finish plus per-member incremental decode for
        multi-member gzip files.
        """
        self._check()
        if self.mode != "inflate":
            self._poisoned = True
            raise errors.IncorrectUseError("finish() on a deflate stream")
        try:
            out = decompress(bytes(self._buf), format=self.format,
                             dictionary=self.dictionary)
        except errors.JDeflateError:
            self._poisoned = True
            raise
        self._buf.clear()
        self._finished = True
        self.total_out += len(out)
        return out
