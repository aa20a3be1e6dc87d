"""Gandiva-analogue (compiled projector/filter), plasma store, native lib."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.errors import Invalid
from arrow1_tpu.gandiva import make_filter, make_projector
from arrow1_tpu.native import MemoTable, hash_bytes, native_available


def batch():
    return a1t.record_batch({
        "a": pa.array([1, 2, None, 4, 5], type=pa.int64()),
        "b": pa.array([10.0, 20.0, 30.0, 40.0, None]),
    })


class TestGandiva:
    def test_projector(self):
        b = batch()
        proj = make_projector(b.schema, [
            (a1t.field("a") * 2 + 1, "a2"),
            (a1t.field("b") / 10.0, "b10"),
        ])
        out = proj.evaluate(b)
        assert out.names == ("a2", "b10")
        assert out["a2"].to_arrow().to_pylist() == [3, 5, None, 9, 11]

    def test_filter_selection_vector(self):
        b = batch()
        filt = make_filter(b.schema, a1t.field("a") > 1)
        sel = filt.evaluate(b)
        assert len(sel) == 3
        assert sel.to_column().to_numpy().tolist() == [1, 3, 4]

    def test_filter_then_project(self):
        # the Gandiva composition: Filter -> SelectionVector -> Projector
        b = batch()
        filt = make_filter(b.schema, a1t.field("a") > 1)
        proj = make_projector(b.schema, [(a1t.field("a") + 100, "x")])
        out = proj.evaluate(b, selection=filt.evaluate(b))
        assert out["x"].to_arrow().to_pylist() == [102, 104, 105]

    def test_projector_reuse_compiled(self):
        b = batch()
        proj = make_projector(b.schema, [(a1t.field("a") + 1, "x")])
        out1 = proj.evaluate(b)
        out2 = proj.evaluate(b)  # second call hits the XLA cache
        assert out1["x"].to_arrow().equals(out2["x"].to_arrow())

    def test_bind_failure(self):
        b = batch()
        with pytest.raises(KeyError):
            make_filter(b.schema, a1t.field("missing") > 1)


class TestNative:
    def test_hash_stable(self):
        h1, h2 = hash_bytes(b"hello"), hash_bytes(b"hello")
        assert h1 == h2
        assert hash_bytes(b"hellp") != h1

    def test_memo_table(self):
        m = MemoTable()
        assert m.get_or_insert(b"x") == 0
        assert m.get_or_insert(b"y") == 1
        assert m.get_or_insert(b"x") == 0
        assert m.lookup(b"y") == 1
        assert m.lookup(b"nope") == -1
        assert len(m) == 2
        assert m.values() == [b"x", b"y"]

    def test_memo_bulk_encode(self):
        m = MemoTable()
        data = np.frombuffer(b"aabbbaab", dtype=np.uint8)
        offsets = np.array([0, 2, 5, 7, 8], dtype=np.int64)
        ids = m.encode_array(data, offsets)
        # values: aa, bbb, aa, b
        assert ids.tolist() == [0, 1, 0, 2]
        assert m.values() == [b"aa", b"bbb", b"b"]

    def test_memo_many_grow(self):
        m = MemoTable(4)
        for i in range(5000):
            assert m.get_or_insert(f"v{i}".encode()) == i
        for i in range(0, 5000, 37):
            assert m.lookup(f"v{i}".encode()) == i
        assert len(m) == 5000


@pytest.mark.skipif(not native_available(),
                    reason="native library not built")
class TestPlasma:
    def test_roundtrip_and_lifecycle(self):
        from arrow1_tpu.plasma import ObjectID, PlasmaStore

        st = PlasmaStore("/a1t-pytest-store", capacity=1 << 20,
                         max_objects=32)
        try:
            rb = a1t.record_batch({"x": [1, 2, 3], "s": ["a", None, "b"]})
            oid = st.put(rb)
            assert st.contains(oid)
            back = st.get(oid).combine_chunks()
            assert back["x"].to_numpy().tolist() == [1, 2, 3]
            assert back["s"].to_numpy().tolist() == ["a", None, "b"]
            named = ObjectID.of("my-table")
            st.put(rb, named)
            assert st.contains(named)
            assert len(st.list()) == 2
            st.delete(named)
            assert not st.contains(named)
            assert st.bytes_used > 0
        finally:
            st.destroy()

    def test_eviction(self):
        from arrow1_tpu.plasma import ObjectID, PlasmaStore

        st = PlasmaStore("/a1t-pytest-evict", capacity=16 << 10,
                         max_objects=32)
        try:
            # fill beyond capacity; LRU objects evicted
            for i in range(10):
                st.put_bytes(ObjectID.of(f"obj{i}"), b"z" * 4096)
            assert st.evictions > 0
            assert st.contains(ObjectID.of("obj9"))
        finally:
            st.destroy()

    def test_pin_blocks_eviction(self):
        from arrow1_tpu.plasma import ObjectID, PlasmaStore

        st = PlasmaStore("/a1t-pytest-pin", capacity=16 << 10,
                         max_objects=32)
        try:
            first = ObjectID.of("first")
            st.put_bytes(first, b"a" * 4096)
            buf = st.get_buffer(first)  # pins
            for i in range(10):
                st.put_bytes(ObjectID.of(f"fill{i}"), b"z" * 4096)
            assert st.contains(first)  # pinned -> survived
            assert bytes(buf[:4]) == b"aaaa"
            st.release(first)
        finally:
            st.destroy()
