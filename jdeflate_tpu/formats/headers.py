"""RFC 1950 (zlib) / RFC 1952 (gzip) header and trailer handling.

Reference behavior reproduced: format autodetection by first byte
(parsehead, src/zstrm.c:567-624), gzip header parse with
FEXTRA/FNAME/FCOMMENT/FHCRC skipping and minimal 10-byte emission
(parsegziphead/emitgziphead, src/zstrm.c:446-509, 1003-1022), zlib CMF/FLG
parse with FDICT dictid and 0x78-based emission
(parsezlibhead/emitzlibhead, src/zstrm.c:513-565, 1024-1052), and the
CRC32+ISIZE / big-endian adler32 trailers (src/zstrm.c:626-693, 1233-1265).
"""
from __future__ import annotations

import struct

from ..utils import errors

GZIP_MAGIC = b"\x1f\x8b"

FTEXT = 1
FHCRC = 2
FEXTRA = 4
FNAME = 8
FCOMMENT = 16


def detect_format(first_byte: int, accepted: set[str]) -> str:
    """First-byte format heuristic (parsehead, zstrm.c:567-624)."""
    if first_byte == 0x1F and "gzip" in accepted:
        return "gzip"
    if (first_byte & 0x0F) == 0x08 and "zlib" in accepted:
        return "zlib"
    if (first_byte & 0x06) == 0x06:     # BTYPE=11 reserved: cannot be raw
        raise errors.FormatError("unrecognized stream header")
    if "raw" in accepted:
        return "raw"
    raise errors.FormatError("stream format not accepted")


def emit_gzip_header() -> bytes:
    """Minimal header: magic, CM=8, no flags, mtime 0, XFL 0, OS 255."""
    return GZIP_MAGIC + b"\x08\x00\x00\x00\x00\x00\x00\xff"


def parse_gzip_header(data: bytes) -> int:
    """Validate and skip a gzip header; returns its length."""
    if len(data) < 10:
        raise errors.InputEndError("truncated gzip header")
    if data[:2] != GZIP_MAGIC:
        raise errors.FormatError("bad gzip magic")
    if data[2] != 8:
        raise errors.FormatError("unsupported gzip compression method")
    flg = data[3]
    pos = 10
    if flg & FEXTRA:
        if len(data) < pos + 2:
            raise errors.InputEndError("truncated FEXTRA")
        xlen = data[pos] | (data[pos + 1] << 8)
        pos += 2 + xlen
    if flg & FNAME:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise errors.InputEndError("truncated FNAME")
        pos = end + 1
    if flg & FCOMMENT:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise errors.InputEndError("truncated FCOMMENT")
        pos = end + 1
    if flg & FHCRC:
        pos += 2
    if pos > len(data):
        raise errors.InputEndError("truncated gzip header")
    return pos


def emit_gzip_trailer(crc: int, isize: int) -> bytes:
    return struct.pack("<II", crc & 0xFFFFFFFF, isize & 0xFFFFFFFF)


def check_gzip_trailer(data: bytes, crc: int, isize: int):
    if len(data) < 8:
        raise errors.InputEndError("truncated gzip trailer")
    want_crc, want_isize = struct.unpack("<II", data[:8])
    if want_crc != (crc & 0xFFFFFFFF):
        raise errors.ChecksumError("gzip CRC32 mismatch")
    if want_isize != (isize & 0xFFFFFFFF):
        raise errors.ChecksumError("gzip ISIZE mismatch")


def emit_zlib_header(level: int, dictid: int | None = None) -> bytes:
    cmf = 0x78                       # CM=8, CINFO=7 (32K window)
    flevel = 0 if level <= 1 else (1 if level <= 5 else (2 if level == 6 else 3))
    flg = (flevel << 6) | (0x20 if dictid is not None else 0)
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    out = bytes([cmf, flg])
    if dictid is not None:
        out += struct.pack(">I", dictid & 0xFFFFFFFF)
    return out


def parse_zlib_header(data: bytes):
    """Returns (header_len, dictid_or_None)."""
    if len(data) < 2:
        raise errors.InputEndError("truncated zlib header")
    cmf, flg = data[0], data[1]
    if (cmf & 0x0F) != 8:
        raise errors.FormatError("unsupported zlib compression method")
    if (cmf >> 4) > 7:
        raise errors.FormatError("zlib window too large")
    if (cmf * 256 + flg) % 31 != 0:
        raise errors.FormatError("bad zlib header check")
    if flg & 0x20:
        if len(data) < 6:
            raise errors.InputEndError("truncated zlib dictid")
        return 6, struct.unpack(">I", data[2:6])[0]
    return 2, None


def emit_zlib_trailer(adler: int) -> bytes:
    return struct.pack(">I", adler & 0xFFFFFFFF)


def check_zlib_trailer(data: bytes, adler: int):
    if len(data) < 4:
        raise errors.InputEndError("truncated zlib trailer")
    (want,) = struct.unpack(">I", data[:4])
    if want != (adler & 0xFFFFFFFF):
        raise errors.ChecksumError("zlib adler32 mismatch")
