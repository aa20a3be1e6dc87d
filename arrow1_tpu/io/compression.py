"""Compression codecs + compressed stream wrappers.

Reference: cpp/src/arrow/util/compression*.{h,cc} (zlib/lz4/zstd/snappy/
brotli/bz2 codec registry) and io/compressed.h (stream wrappers). Codec
implementations come from pyarrow (the same C++ codecs); this module is
the engine-facing registry + buffer/stream API.
"""

from __future__ import annotations

from typing import List, Optional

from ..errors import Invalid

__all__ = ["Codec", "compress", "decompress", "supported_codecs",
           "CompressedOutputStream", "CompressedInputStream"]


def supported_codecs() -> List[str]:
    import pyarrow as pa

    out = []
    for name in ("gzip", "lz4", "zstd", "snappy", "brotli", "bz2"):
        try:
            if pa.Codec.is_available(name):
                out.append(name)
        except Exception:
            pass
    return out


class Codec:
    """Reference: util/compression.h Codec::Create."""

    def __init__(self, name: str, compression_level: Optional[int] = None):
        import pyarrow as pa

        if not pa.Codec.is_available(name):
            raise Invalid(f"codec {name!r} not available")
        self.name = name
        self._codec = pa.Codec(name, compression_level=compression_level)

    def compress(self, data: bytes) -> bytes:
        return self._codec.compress(data, asbytes=True)

    def decompress(self, data: bytes,
                   decompressed_size: Optional[int] = None) -> bytes:
        return self._codec.decompress(
            data, decompressed_size=decompressed_size, asbytes=True)


def compress(data: bytes, codec: str = "zstd") -> bytes:
    return Codec(codec).compress(data)


def decompress(data: bytes, codec: str = "zstd",
               decompressed_size: Optional[int] = None) -> bytes:
    return Codec(codec).decompress(data, decompressed_size)


def CompressedOutputStream(sink, codec: str = "zstd"):
    """Reference: io/compressed.h CompressedOutputStream."""
    import pyarrow as pa

    return pa.CompressedOutputStream(sink, codec)


def CompressedInputStream(source, codec: str = "zstd"):
    """Reference: io/compressed.h CompressedInputStream."""
    import pyarrow as pa

    return pa.CompressedInputStream(source, codec)
