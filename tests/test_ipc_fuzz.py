"""Malformed-input robustness for the native wire decoders.

Reference: the libFuzzer targets ipc/stream_fuzz.cc / file_fuzz.cc —
decoders fed hostile bytes must fail CLEANLY (raise), never crash,
hang, or allocate unboundedly. Deterministic mutation corpus (seeded):
bit flips, truncations, length-field inflation, garbage prefixes.
"""

import io

import numpy as np
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.io import ipc_native

CLEAN = (Exception,)  # any python exception is a clean failure


def valid_stream() -> bytes:
    rb = a1t.record_batch({
        "x": [1, 2, None, 4],
        "f": [0.5, None, 2.5, -1.0],
        "s": ["aa", "bb", None, "aa"],
    })
    buf = io.BytesIO()
    ipc_native.write_stream(buf, rb)
    return buf.getvalue()


def try_read(data: bytes):
    try:
        ipc_native.read_stream(io.BytesIO(data))
    except CLEAN:
        pass  # clean rejection


class TestIpcStreamFuzz:
    def test_bit_flips(self):
        base = valid_stream()
        rng = np.random.default_rng(0)
        for _ in range(200):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                pos = int(rng.integers(0, len(data)))
                data[pos] ^= 1 << int(rng.integers(0, 8))
            try_read(bytes(data))

    def test_truncations(self):
        base = valid_stream()
        for cut in range(0, len(base), max(1, len(base) // 64)):
            try_read(base[:cut])

    def test_length_field_inflation(self):
        base = bytearray(valid_stream())
        # metadata-length int32 right after the first continuation
        import struct

        for huge in (0x7FFFFFFF, -1, len(base) * 2):
            data = bytearray(base)
            struct.pack_into("<i", data, 4, huge)
            try_read(bytes(data))

    def test_garbage(self):
        rng = np.random.default_rng(1)
        for n in (0, 1, 7, 64, 4096):
            try_read(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        try_read(b"\xff\xff\xff\xff" + b"\x00" * 64)

    def test_file_footer_fuzz(self):
        rb = a1t.record_batch({"x": [1, 2]})
        buf = io.BytesIO()
        ipc_native.write_file(buf, rb)
        base = buf.getvalue()
        rng = np.random.default_rng(2)
        for _ in range(100):
            data = bytearray(base)
            # target the footer region specifically
            pos = len(data) - 1 - int(rng.integers(0, min(64, len(data))))
            data[pos] ^= 0xFF
            try:
                ipc_native.read_file(io.BytesIO(bytes(data)))
            except CLEAN:
                pass


class TestLz4FrameFuzz:
    def test_mutated_frames(self):
        from arrow1_tpu.native import (lz4_frame_compress,
                                       lz4_frame_decompress,
                                       native_available)

        if not native_available():
            pytest.skip("native unavailable")
        base = lz4_frame_compress(b"payload " * 1000)
        rng = np.random.default_rng(3)
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                pos = int(rng.integers(0, len(data)))
                data[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                out = lz4_frame_decompress(bytes(data), 8 * 1000)
                assert len(out) <= 8 * 1000
            except (RuntimeError, Exception):
                pass

    def test_truncated_frames(self):
        from arrow1_tpu.native import (lz4_frame_compress,
                                       lz4_frame_decompress,
                                       native_available)

        if not native_available():
            pytest.skip("native unavailable")
        base = lz4_frame_compress(b"abc" * 5000)
        for cut in range(0, len(base), max(1, len(base) // 50)):
            try:
                lz4_frame_decompress(base[:cut], 15000)
            except RuntimeError:
                pass


class TestParquetFuzz:
    def test_mutations(self):
        import io as _io

        from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                                  write_parquet_native)

        rb = a1t.record_batch({"x": [1, 2, None], "s": ["a", "b", "a"],
                               "l": [[1], [], [2, 3]]})
        buf = _io.BytesIO()
        write_parquet_native(rb, buf, compression="none")
        base = buf.getvalue()
        rng = np.random.default_rng(4)
        for _ in range(150):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                pos = int(rng.integers(0, len(data)))
                data[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                read_parquet_native(bytes(data))
            except CLEAN:
                pass

    def test_truncations(self):
        import io as _io

        from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                                  write_parquet_native)

        rb = a1t.record_batch({"x": [1, 2, 3]})
        buf = _io.BytesIO()
        write_parquet_native(rb, buf, compression="none")
        base = buf.getvalue()
        for cut in range(0, len(base), max(1, len(base) // 40)):
            try:
                read_parquet_native(base[:cut])
            except CLEAN:
                pass


class TestNativeParserFuzz:
    def test_csv_random_bytes(self):
        from arrow1_tpu.io._native_tbl import tbl_lib

        lib = tbl_lib()
        if lib is None:
            pytest.skip("native unavailable")
        rng = np.random.default_rng(5)
        for n in (0, 1, 17, 256, 4096):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            h = lib.a1t_csv_parse(data, len(data), b",", b'"', 1, 0, 0)
            lib.a1t_tbl_free(h)

    def test_json_random_bytes(self):
        from arrow1_tpu.io._native_tbl import tbl_lib

        lib = tbl_lib()
        if lib is None:
            pytest.skip("native unavailable")
        rng = np.random.default_rng(6)
        for n in (0, 1, 17, 256, 4096):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            h = lib.a1t_json_parse(data, len(data), 0)
            lib.a1t_tbl_free(h)
        # mutated valid lines
        base = bytearray(b'{"a": 1, "l": [1, 2], "s": {"x": "y"}}\n' * 20)
        for _ in range(200):
            data = bytearray(base)
            pos = int(rng.integers(0, len(data)))
            data[pos] ^= 1 << int(rng.integers(0, 8))
            h = lib.a1t_json_parse(bytes(data), len(data), 0)
            lib.a1t_tbl_free(h)
