"""ctypes binding for the native host runtime (native/).

Components (see native/src/*.cpp for the reference mapping):
- shared-memory object store  <- cpp/src/plasma/
- hash + memo table           <- cpp/src/arrow/util/hashing.h

The library auto-builds on first use (cmake+make, cached under
native/build); everything degrades gracefully to pure-Python fallbacks if
the toolchain is unavailable (`native_available()` reports which)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["native_available", "load_library", "hash_bytes", "MemoTable"]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libarrow1_tpu_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(["cmake", "-S", _NATIVE_DIR, "-B", _BUILD_DIR,
                        "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", _BUILD_DIR, "-j"],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        if not hasattr(lib, "a1t_ipc_open"):
            # stale .so from an older source tree: rebuild once
            del lib
            import shutil

            shutil.rmtree(_BUILD_DIR, ignore_errors=True)
            if not _build():
                _build_failed = True
                return None
            lib = ctypes.CDLL(_LIB_PATH)
        # store API
        lib.a1t_store_create.restype = ctypes.c_void_p
        lib.a1t_store_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                         ctypes.c_uint64]
        lib.a1t_store_open.restype = ctypes.c_void_p
        lib.a1t_store_open.argtypes = [ctypes.c_char_p]
        lib.a1t_create.restype = ctypes.c_void_p
        lib.a1t_create.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint64]
        lib.a1t_seal.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.a1t_get.restype = ctypes.c_void_p
        lib.a1t_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_uint64)]
        lib.a1t_release.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.a1t_delete.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.a1t_contains.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.a1t_list.restype = ctypes.c_uint64
        lib.a1t_list.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_uint64]
        lib.a1t_store_bytes_used.restype = ctypes.c_uint64
        lib.a1t_store_bytes_used.argtypes = [ctypes.c_void_p]
        lib.a1t_store_evictions.restype = ctypes.c_uint64
        lib.a1t_store_evictions.argtypes = [ctypes.c_void_p]
        lib.a1t_store_close.argtypes = [ctypes.c_void_p]
        lib.a1t_store_destroy.argtypes = [ctypes.c_char_p]
        # hash/memo API
        lib.a1t_hash_bytes.restype = ctypes.c_uint64
        lib.a1t_hash_bytes.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.a1t_hash_binary_array.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.a1t_memo_create.restype = ctypes.c_void_p
        lib.a1t_memo_create.argtypes = [ctypes.c_uint64]
        lib.a1t_memo_destroy.argtypes = [ctypes.c_void_p]
        lib.a1t_memo_size.restype = ctypes.c_int32
        lib.a1t_memo_size.argtypes = [ctypes.c_void_p]
        lib.a1t_memo_get_or_insert.restype = ctypes.c_int32
        lib.a1t_memo_get_or_insert.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.a1t_memo_lookup.restype = ctypes.c_int32
        lib.a1t_memo_lookup.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.a1t_memo_encode_array.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p]
        lib.a1t_memo_values.restype = ctypes.c_void_p
        lib.a1t_memo_values.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        # lz4 codec API
        buf_t = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                 ctypes.c_int64]
        for fn in ("a1t_lz4_block_compress", "a1t_lz4_block_decompress",
                   "a1t_lz4_frame_compress", "a1t_lz4_frame_decompress"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = buf_t
        lib.a1t_lz4_frame_max_compressed.restype = ctypes.c_int64
        lib.a1t_lz4_frame_max_compressed.argtypes = [ctypes.c_int64]
        _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame compression (native/src/lz4.cpp — original block +
    frame implementation; reference: util/compression_lz4.cc surface)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native lz4 unavailable (no toolchain)")
    cap = int(lib.a1t_lz4_frame_max_compressed(len(data)))
    out = ctypes.create_string_buffer(cap)
    n = lib.a1t_lz4_frame_compress(data, len(data), out, cap)
    if n < 0:
        raise RuntimeError("lz4 frame compress failed")
    return out.raw[:n]


def lz4_frame_decompress(data: bytes, uncompressed_size: int) -> bytes:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native lz4 unavailable (no toolchain)")
    out = ctypes.create_string_buffer(max(uncompressed_size, 1))
    n = lib.a1t_lz4_frame_decompress(data, len(data), out,
                                     uncompressed_size)
    if n < 0:
        raise RuntimeError("lz4 frame decompress failed (malformed input)")
    return out.raw[:n]


def hash_bytes(data: bytes) -> int:
    lib = load_library()
    if lib is None:
        import hashlib

        return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(),
                              "little")
    return int(lib.a1t_hash_bytes(data, len(data)))


class MemoTable:
    """bytes -> dense id in insertion order (reference:
    util/hashing.h:605 BinaryMemoTable). Falls back to a Python dict when
    the native library is unavailable."""

    def __init__(self, initial_capacity: int = 64):
        self._lib = load_library()
        if self._lib is not None:
            self._handle = self._lib.a1t_memo_create(initial_capacity)
            self._fallback = None
        else:
            self._handle = None
            self._fallback = {}
            self._values = []

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib:
            self._lib.a1t_memo_destroy(self._handle)
            self._handle = None

    def get_or_insert(self, value: bytes) -> int:
        if self._handle is not None:
            return int(self._lib.a1t_memo_get_or_insert(
                self._handle, value, len(value)))
        if value not in self._fallback:
            self._fallback[value] = len(self._values)
            self._values.append(value)
        return self._fallback[value]

    def lookup(self, value: bytes) -> int:
        if self._handle is not None:
            return int(self._lib.a1t_memo_lookup(self._handle, value,
                                                 len(value)))
        return self._fallback.get(value, -1)

    def __len__(self):
        if self._handle is not None:
            return int(self._lib.a1t_memo_size(self._handle))
        return len(self._values)

    def encode_array(self, data: np.ndarray, offsets: np.ndarray
                     ) -> np.ndarray:
        """Bulk dictionary-encode an arrow var-binary buffer pair.

        Offsets are validated here — the C side dereferences them raw,
        so hostile wire input must be rejected at this boundary."""
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        n = len(offsets) - 1
        if n < 0 or (n and (offsets[0] < 0
                            or np.any(np.diff(offsets) < 0)
                            or int(offsets[-1]) > int(np.asarray(
                                data).size))):
            raise ValueError("memo.encode_array: corrupt offsets")
        ids = np.empty(n, dtype=np.int32)
        if self._handle is not None:
            self._lib.a1t_memo_encode_array(
                self._handle,
                data.ctypes.data_as(ctypes.c_void_p),
                np.ascontiguousarray(offsets, dtype=np.int64)
                .ctypes.data_as(ctypes.c_void_p),
                n, ids.ctypes.data_as(ctypes.c_void_p))
        else:
            for i in range(n):
                ids[i] = self.get_or_insert(
                    bytes(data[offsets[i]:offsets[i + 1]]))
        return ids

    def values(self):
        """All distinct values in insertion order, as a list of bytes."""
        if self._handle is None:
            return list(self._values)
        n = len(self)
        offsets = np.empty(n + 1, dtype=np.int64)
        ptr = self._lib.a1t_memo_values(
            self._handle, offsets.ctypes.data_as(ctypes.c_void_p))
        total = int(offsets[-1])
        buf = ctypes.string_at(ptr, total) if total else b""
        return [buf[offsets[i]:offsets[i + 1]] for i in range(n)]


def lz4_block_decompress(data: bytes, max_size: int) -> bytes:
    """Raw LZ4 block decompress (ORC chunk bodies)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native lz4 unavailable (no toolchain)")
    out = ctypes.create_string_buffer(max(max_size, 1))
    n = lib.a1t_lz4_block_decompress(data, len(data), out, max_size)
    if n < 0:
        raise RuntimeError("lz4 block decompress failed (malformed)")
    return out.raw[:n]


def snappy_decompress(data: bytes) -> bytes:
    """Snappy block decompress; output size from the stream preamble."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native snappy unavailable (no toolchain)")
    lib.a1t_snappy_decompress.restype = ctypes.c_int64
    lib.a1t_snappy_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    # preamble varint = uncompressed length
    usize = shift = pos = 0
    while True:
        b = data[pos]
        pos += 1
        usize |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = ctypes.create_string_buffer(max(usize, 1))
    n = lib.a1t_snappy_decompress(data, len(data), out, usize)
    if n < 0:
        raise RuntimeError("snappy decompress failed (malformed input)")
    return out.raw[:n]


def ragged_gather(codes, u_starts, pool, row_valid, total: int,
                  large: bool = False):
    """Dictionary codes + unique pool -> (offsets, data) var-binary
    buffers (native/src/ragged.cpp). `total` = exact payload size."""
    lib = load_library()
    if lib is None:
        return None
    import numpy as np

    fn = lib.a1t_ragged_gather64 if large else lib.a1t_ragged_gather
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_void_p] * 6 + [ctypes.c_void_p,
                                           ctypes.c_int64]
    n = len(codes)
    codes = np.ascontiguousarray(codes, np.int64)
    u_starts = np.ascontiguousarray(u_starts, np.int64)
    pool = np.ascontiguousarray(pool, np.uint8)
    offsets = np.empty(n + 1, np.int64 if large else np.int32)
    data = np.empty(max(total, 1), np.uint8)
    rv = None
    if row_valid is not None:
        rv = np.ascontiguousarray(row_valid, np.uint8)
    got = fn(codes.ctypes.data, n, u_starts.ctypes.data,
             pool.ctypes.data,
             rv.ctypes.data if rv is not None else None,
             offsets.ctypes.data, data.ctypes.data, total)
    if got != total:
        return None
    return offsets, data[:total]


def plain_byte_array(codes, u_starts, pool, row_valid, cap: int):
    """Parquet PLAIN byte-array encode (native/src/ragged.cpp)."""
    lib = load_library()
    if lib is None:
        return None
    import numpy as np

    fn = lib.a1t_plain_byte_array
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_void_p] * 5 + [ctypes.c_void_p,
                                           ctypes.c_int64]
    codes = np.ascontiguousarray(codes, np.int64)
    u_starts = np.ascontiguousarray(u_starts, np.int64)
    pool = np.ascontiguousarray(pool, np.uint8)
    rv = None
    if row_valid is not None:
        rv = np.ascontiguousarray(row_valid, np.uint8)
    out = np.empty(max(cap, 1), np.uint8)
    got = fn(codes.ctypes.data, len(codes), u_starts.ctypes.data,
             pool.ctypes.data,
             rv.ctypes.data if rv is not None else None,
             out.ctypes.data, cap)
    if got < 0:
        return None
    return out[:got].tobytes()
