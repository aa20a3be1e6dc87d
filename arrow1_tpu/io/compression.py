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
    """Reference: util/compression.h Codec::Create.

    lz4 rides the native frame codec (native/src/lz4.cpp) when the native
    library is built; other codecs delegate to pyarrow's (the same C++
    libraries the reference links)."""

    def __init__(self, name: str, compression_level: Optional[int] = None):
        self.name = name
        self._native_lz4 = False
        if name == "lz4":
            from ..native import native_available

            if native_available():
                self._native_lz4 = True
                return
        import pyarrow as pa

        if not pa.Codec.is_available(name):
            raise Invalid(f"codec {name!r} not available")
        self._codec = pa.Codec(name, compression_level=compression_level)

    def compress(self, data: bytes) -> bytes:
        if self._native_lz4:
            from ..native import lz4_frame_compress

            return lz4_frame_compress(bytes(data))
        return self._codec.compress(data, asbytes=True)

    def decompress(self, data: bytes,
                   decompressed_size: Optional[int] = None) -> bytes:
        if self._native_lz4:
            from ..native import lz4_frame_decompress

            if decompressed_size is None:
                # frame carries content size when we wrote it; otherwise
                # grow-and-retry
                import struct

                flg = data[4]
                if flg & 0x08:
                    (decompressed_size,) = struct.unpack_from("<Q", data, 6)
                else:
                    cap = max(4 * len(data), 1 << 16)
                    while True:
                        try:
                            return lz4_frame_decompress(bytes(data), cap)
                        except RuntimeError:
                            if cap > (1 << 31):
                                raise
                            cap *= 4
            return lz4_frame_decompress(bytes(data),
                                        int(decompressed_size))
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
