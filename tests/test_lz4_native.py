"""Native LZ4 block+frame codec (native/src/lz4.cpp).

Interop oracle: pyarrow's lz4 (the reference lz4frame library) in BOTH
directions, including linked-block frames (pyarrow writes FLG b.indep=0)
and multi-block >4MB payloads.
"""

import io

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.io import ipc_native
from arrow1_tpu.native import (lz4_frame_compress, lz4_frame_decompress,
                               native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


class TestFrameCodec:
    def test_roundtrip_own(self):
        data = (b"the quick brown fox " * 500) + bytes(range(256))
        c = lz4_frame_compress(data)
        assert len(c) < len(data) // 2
        assert lz4_frame_decompress(c, len(data)) == data

    def test_empty(self):
        assert lz4_frame_decompress(lz4_frame_compress(b""), 0) == b""

    def test_incompressible_stored(self):
        rng = np.random.default_rng(0)
        data = bytes(rng.integers(0, 256, 10000, dtype=np.uint8))
        c = lz4_frame_compress(data)
        assert lz4_frame_decompress(c, len(data)) == data

    def test_pyarrow_reads_ours(self):
        codec = pa.Codec("lz4")
        data = b"abcabcabc" * 10000
        got = codec.decompress(pa.py_buffer(lz4_frame_compress(data)),
                               len(data)).to_pybytes()
        assert got == data

    def test_we_read_pyarrow_linked_blocks(self):
        # pyarrow emits linked blocks (b.indep=0): matches cross the
        # 64 KB block boundary and reference prior blocks' output
        codec = pa.Codec("lz4")
        data = (b"0123456789abcdef" * 20000)  # 320 KB, 64K-periodic
        comp = codec.compress(data).to_pybytes()
        assert (comp[4] >> 5) & 1 == 0  # really linked
        assert lz4_frame_decompress(comp, len(data)) == data

    def test_multiblock_over_4mb(self):
        rng = np.random.default_rng(1)
        data = (b"pattern!" * 700000) + bytes(
            rng.integers(0, 256, 999, dtype=np.uint8))
        codec = pa.Codec("lz4")
        assert codec.decompress(pa.py_buffer(lz4_frame_compress(data)),
                                len(data)).to_pybytes() == data
        assert lz4_frame_decompress(codec.compress(data).to_pybytes(),
                                    len(data)) == data

    def test_malformed_raises(self):
        with pytest.raises(RuntimeError):
            lz4_frame_decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07", 100)


class TestIpcLz4:
    def make_batch(self):
        rng = np.random.default_rng(0)
        return a1t.record_batch({
            "x": rng.integers(0, 50, 5000),
            "f": rng.standard_normal(5000),
            "s": rng.choice(["aa", "bb", "cc"], 5000),
        })

    def test_stream_roundtrip_own(self):
        rb = self.make_batch()
        buf = io.BytesIO()
        ipc_native.write_stream(buf, rb, compression="lz4")
        buf.seek(0)
        back = ipc_native.read_stream(buf)
        assert back[0].to_arrow().equals(rb.to_arrow())

    def test_pyarrow_reads_our_stream(self):
        rb = self.make_batch()
        buf = io.BytesIO()
        ipc_native.write_stream(buf, rb, compression="lz4")
        got = pa.ipc.open_stream(buf.getvalue()).read_all()
        assert got.to_batches()[0].equals(rb.to_arrow())

    def test_we_read_pyarrow_stream(self):
        rb = self.make_batch()
        sink = pa.BufferOutputStream()
        w = pa.ipc.new_stream(sink, rb.to_arrow().schema,
                              options=pa.ipc.IpcWriteOptions(
                                  compression="lz4"))
        w.write_batch(rb.to_arrow())
        w.close()
        back = ipc_native.read_stream(
            io.BytesIO(sink.getvalue().to_pybytes()))
        assert back[0].to_arrow().equals(rb.to_arrow())

    def test_codec_registry(self):
        from arrow1_tpu.io.compression import Codec

        c = Codec("lz4")
        data = b"registry" * 1000
        comp = c.compress(data)
        assert c.decompress(comp, len(data)) == data
        # content-size path (no size hint)
        assert c.decompress(comp) == data
