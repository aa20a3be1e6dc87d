"""Filesystem abstraction, compression codecs, validation."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.errors import Invalid
from arrow1_tpu.fs import (LocalFileSystem, MockFileSystem,
                           filesystem_from_uri)
from arrow1_tpu.io.compression import (Codec, CompressedInputStream,
                                       CompressedOutputStream, compress,
                                       decompress, supported_codecs)
from arrow1_tpu.validate import validate_batch, validate_column


class TestFilesystems:
    def test_local(self, tmp_path):
        fs = LocalFileSystem()
        p = str(tmp_path / "x.bin")
        with fs.open_output(p) as f:
            f.write(b"hello")
        info = fs.get_file_info(p)
        assert info.is_file and info.size == 5
        with fs.open_input(p) as f:
            assert f.read() == b"hello"
        listing = fs.ls(str(tmp_path))
        assert any(i.path.endswith("x.bin") for i in listing)
        fs.delete(p)
        with pytest.raises(FileNotFoundError):
            fs.get_file_info(p)

    def test_mock(self):
        fs = MockFileSystem()
        with fs.open_output("a/b/data.bin") as f:
            f.write(b"xyz")
        assert fs.get_file_info("a/b/data.bin").size == 3
        assert fs.open_input("a/b/data.bin").read() == b"xyz"
        ls = fs.ls("a")
        assert len(ls) == 1 and not ls[0].is_file  # the "b" dir
        ls2 = fs.ls("a/b")
        assert ls2[0].is_file
        fs.delete("a/b/data.bin")
        with pytest.raises(FileNotFoundError):
            fs.open_input("a/b/data.bin")

    def test_uri_dispatch(self, tmp_path):
        fs, path = filesystem_from_uri(f"file://{tmp_path}/f")
        assert isinstance(fs, LocalFileSystem)
        fs2, _ = filesystem_from_uri("mock://bucket/key")
        assert isinstance(fs2, MockFileSystem)
        with pytest.raises(Invalid):
            filesystem_from_uri("weird://x")


class TestCompression:
    def test_codecs_available(self):
        codecs = supported_codecs()
        assert "zstd" in codecs and "lz4" in codecs

    @pytest.mark.parametrize("codec", ["zstd", "gzip", "lz4"])
    def test_roundtrip(self, codec):
        data = b"columnar " * 1000
        c = compress(data, codec)
        assert len(c) < len(data)
        assert decompress(c, codec, decompressed_size=len(data)) == data

    def test_streams(self, tmp_path):
        p = str(tmp_path / "c.zst")
        with CompressedOutputStream(p, "zstd") as f:
            f.write(b"streamed " * 500)
        with CompressedInputStream(p, "zstd") as f:
            assert f.read() == b"streamed " * 500

    def test_bad_codec(self):
        with pytest.raises(Exception):
            Codec("nope")


class TestValidate:
    def test_valid_batch(self):
        rb = a1t.record_batch({"x": [1, 2], "s": ["a", None]})
        validate_batch(rb, full=True)

    def test_bad_validity_length(self):
        import jax.numpy as jnp

        from arrow1_tpu.column import Column

        col = Column(jnp.arange(3), a1t.int64,
                     validity=jnp.ones(2, jnp.bool_))
        with pytest.raises(Invalid, match="validity length"):
            validate_column(col)

    def test_dict_codes_out_of_range(self):
        import jax.numpy as jnp

        from arrow1_tpu.column import Column, Dictionary

        col = Column(jnp.asarray(np.array([0, 5], dtype=np.int32)),
                     a1t.string,
                     dictionary=Dictionary(np.array(["a"], dtype=object)))
        with pytest.raises(Invalid, match="out of range"):
            validate_column(col, full=True)

    def test_list_offsets_monotonic(self):
        import jax.numpy as jnp

        from arrow1_tpu.column import ListColumn

        child = a1t.column(np.arange(5))
        lc = ListColumn(jnp.asarray(np.array([0, 3, 2, 5])), child,
                        a1t.list_(a1t.int64))
        with pytest.raises(Invalid, match="monotonic"):
            validate_column(lc, full=True)

    def test_orc_gated(self):
        from arrow1_tpu.io.orc import orc_available, read_orc, write_orc

        if orc_available():
            import tempfile

            rb = a1t.record_batch({"x": [1, 2, 3]})
            with tempfile.TemporaryDirectory() as d:
                write_orc(rb, f"{d}/t.orc")
                back = read_orc(f"{d}/t.orc")
                assert back.num_rows == 3
        else:
            with pytest.raises(Invalid):
                read_orc("/nonexistent.orc")


class TestParquetEncryption:
    def test_roundtrip_and_deny(self, tmp_path):
        from arrow1_tpu.io.parquet import (decryption_properties,
                                           encryption_properties,
                                           read_parquet, write_parquet)

        rb = a1t.record_batch({"secret": [1, 2, 3], "open": [4.0, 5.0, 6.0]})
        keys = {"k_footer": b"0123456789012345",
                "k_col": b"abcdefghabcdefgh"}
        enc = encryption_properties("k_footer", {"k_col": ["secret"]}, keys)
        path = str(tmp_path / "enc.parquet")
        write_parquet(rb, path, encryption=enc)
        back = read_parquet(
            path, decryption=decryption_properties(keys)).combine_chunks()
        assert back["secret"].to_numpy().tolist() == [1, 2, 3]
        with pytest.raises(Exception):
            read_parquet(path)  # no keys
        with pytest.raises(Exception):
            read_parquet(path, decryption=decryption_properties(
                {"k_footer": b"XXXXXXXXXXXXXXXX",
                 "k_col": keys["k_col"]}))

    def test_plain_write_unaffected(self, tmp_path):
        from arrow1_tpu.io.parquet import read_parquet, write_parquet

        rb = a1t.record_batch({"x": [1, 2]})
        path = str(tmp_path / "plain.parquet")
        write_parquet(rb, path)
        assert read_parquet(path).combine_chunks()["x"].to_numpy().tolist() \
            == [1, 2]


class TestHdfsGate:
    def test_hdfs_uri_dispatches_native(self):
        """hdfs:// no longer requires libhdfs: it dispatches to the
        native WebHDFS REST client (fs_hdfs.py)."""
        from arrow1_tpu.fs import filesystem_from_uri
        from arrow1_tpu.fs_hdfs import WebHdfsFileSystem

        fs, path = filesystem_from_uri("hdfs://namenode:8020/data")
        assert isinstance(fs, WebHdfsFileSystem)
        assert path == "/data"

    def test_clear_error_without_libhdfs(self):
        """The pyarrow-backed fallback class still gates clearly."""
        from arrow1_tpu.errors import Invalid
        from arrow1_tpu.fs import HadoopFileSystem

        with pytest.raises(Invalid, match="HDFS unavailable"):
            HadoopFileSystem("namenode", 8020)
