"""jdeflate-tpu: a TPU-native DEFLATE (RFC 1951/1950/1952) framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of the reference
C library Jpn666/jdeflate (see SURVEY.md): block-parallel deflate encoder
emitting exact decode entry points for free, window-grid Pallas decode
(one lane per 32 stream bits; ops/walk.py + ops/expand2.py), zlib/gzip
framing with device-reduction checksums, bounded-memory streaming, preset
dictionaries, sync-flush seams, FEXTRA self-indexing streams, multi-chip
data-parallel scaling (jdeflate_tpu.parallel).

Quick API:
    import jdeflate_tpu as jd
    blob = jd.compress(data, format="gzip", level=6)
    data = jd.decompress(blob)
"""
from .stream.zstrm import ZStream, compress, compress_with_index, decompress
from .codec.deflate import RawDeflater
from .codec.inflate import RawInflater
from .ops.checksum import adler32, adler32_combine, crc32, crc32_combine
from .utils import errors

__version__ = "0.1.0"

__all__ = [
    "ZStream", "compress", "compress_with_index", "decompress",
    "RawDeflater", "RawInflater",
    "adler32", "adler32_combine", "crc32", "crc32_combine",
    "errors", "__version__",
]


def get_version() -> str:
    """Version string (reference analog: jdeflate_getversion, config.h.in:74)."""
    return __version__
