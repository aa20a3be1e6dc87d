"""IO streams: memory-mapped files, buffered streams, in-memory IO,
read-coalescing cache.

Reference: cpp/src/arrow/io/ — file.h:146 MemoryMappedFile,
buffered.h BufferedInputStream/BufferedOutputStream, memory.h:145
BufferReader/BufferOutputStream, caching.h ReadRangeCache (coalesces
small nearby reads into large fetches — the S3/parquet footer pattern).
"""

from __future__ import annotations

import io
import mmap
import os
from typing import List, Optional, Tuple

from ..errors import Invalid

__all__ = ["MemoryMappedFile", "BufferedInputStream",
           "BufferedOutputStream", "BufferReader", "BufferOutputStream",
           "ReadRangeCache"]


class MemoryMappedFile:
    """Zero-copy reads out of an OS memory mapping (io/file.h:146)."""

    def __init__(self, path: str, mode: str = "r"):
        if mode not in ("r", "r+"):
            raise Invalid(f"MemoryMappedFile mode must be r or r+, "
                          f"got {mode!r}")
        self._f = open(path, "rb" if mode == "r" else "r+b")
        prot = mmap.ACCESS_READ if mode == "r" else mmap.ACCESS_WRITE
        self._mm = mmap.mmap(self._f.fileno(), 0, access=prot)
        self._pos = 0

    @classmethod
    def create(cls, path: str, size: int) -> "MemoryMappedFile":
        with open(path, "wb") as f:
            f.truncate(size)
        return cls(path, "r+")

    def size(self) -> int:
        return len(self._mm)

    def tell(self) -> int:
        return self._pos

    def seek(self, pos: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            self._pos = pos
        elif whence == io.SEEK_CUR:
            self._pos += pos
        else:
            self._pos = len(self._mm) + pos
        return self._pos

    def read(self, n: int = -1) -> bytes:
        end = len(self._mm) if n is None or n < 0 else \
            min(self._pos + n, len(self._mm))
        out = self._mm[self._pos:end]
        self._pos = end
        return out

    def read_at(self, offset: int, n: int) -> memoryview:
        """Zero-copy positional read."""
        return memoryview(self._mm)[offset:offset + n]

    def write(self, data: bytes) -> int:
        self._mm[self._pos:self._pos + len(data)] = data
        self._pos += len(data)
        return len(data)

    def close(self):
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BufferedInputStream(io.BufferedReader):
    """io/buffered.h BufferedInputStream over any raw readable."""

    def __init__(self, raw, buffer_size: int = 1 << 16):
        if isinstance(raw, (str, os.PathLike)):
            raw = open(raw, "rb")
        super().__init__(raw, buffer_size=buffer_size)


class BufferedOutputStream(io.BufferedWriter):
    """io/buffered.h BufferedOutputStream over any raw writable."""

    def __init__(self, raw, buffer_size: int = 1 << 16):
        if isinstance(raw, (str, os.PathLike)):
            raw = open(raw, "wb")
        super().__init__(raw, buffer_size=buffer_size)


class BufferReader(io.BytesIO):
    """io/memory.h:145 BufferReader: read-only view of host bytes."""

    def __init__(self, data):
        super().__init__(bytes(data))

    def write(self, *a):
        raise Invalid("BufferReader is read-only")


class BufferOutputStream(io.BytesIO):
    """io/memory.h BufferOutputStream; .getvalue() finishes."""


class ReadRangeCache:
    """Coalescing range cache (io/caching.h ReadRangeCache): declare the
    ranges you will need, nearby ones merge into single large reads —
    parquet/S3 footer+column-chunk access pattern."""

    def __init__(self, file, hole_size_limit: int = 8192,
                 range_size_limit: int = 32 << 20):
        self._file = file
        self._hole = hole_size_limit
        self._limit = range_size_limit
        self._blocks: List[Tuple[int, bytes]] = []

    def cache(self, ranges: List[Tuple[int, int]]) -> None:
        """ranges: [(offset, length)] — fetched coalesced, now."""
        todo = sorted((off, ln) for off, ln in ranges if ln > 0)
        merged: List[Tuple[int, int]] = []
        for off, ln in todo:
            if merged:
                moff, mln = merged[-1]
                if off <= moff + mln + self._hole and \
                        (off + ln) - moff <= self._limit:
                    merged[-1] = (moff, max(mln, off + ln - moff))
                    continue
            merged.append((off, ln))
        for off, ln in merged:
            self._file.seek(off)
            self._blocks.append((off, self._file.read(ln)))
        self._blocks.sort()

    def read(self, offset: int, length: int) -> bytes:
        """Serve a declared range from cache (reads through on miss)."""
        for off, data in self._blocks:
            if off <= offset and offset + length <= off + len(data):
                lo = offset - off
                return data[lo:lo + length]
        self._file.seek(offset)
        return self._file.read(length)

    @property
    def num_fetches(self) -> int:
        return len(self._blocks)
