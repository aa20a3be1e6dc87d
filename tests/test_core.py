"""Core columnar model: Column/RecordBatch construction + arrow round-trips."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.testing import RandomDataGenerator, assert_column_equal


def test_column_from_numpy():
    col = a1t.column(np.array([1, 2, 3], dtype=np.int64))
    assert col.dtype == a1t.int64
    assert col.length == 3
    assert col.null_count == 0
    assert col.to_numpy().tolist() == [1, 2, 3]


def test_column_with_nulls():
    arr = pa.array([1, None, 3], type=pa.int32())
    col = a1t.column(arr)
    assert col.dtype == a1t.int32
    assert col.null_count == 1
    assert col.to_arrow().equals(arr)


@pytest.mark.parametrize("pa_type,a1_type", [
    (pa.int8(), a1t.int8), (pa.int16(), a1t.int16),
    (pa.int32(), a1t.int32), (pa.int64(), a1t.int64),
    (pa.uint8(), a1t.uint8), (pa.uint64(), a1t.uint64),
    (pa.float32(), a1t.float32), (pa.float64(), a1t.float64),
])
def test_numeric_roundtrip(pa_type, a1_type):
    arr = pa.array([0, 1, 2, None, 4], type=pa_type)
    col = a1t.column(arr)
    assert col.dtype == a1_type
    assert col.to_arrow().equals(arr)


def test_bool_roundtrip():
    arr = pa.array([True, None, False, True])
    col = a1t.column(arr)
    assert col.dtype == a1t.bool_
    assert col.to_arrow().equals(arr)


def test_string_dictionary_encoding():
    arr = pa.array(["foo", "bar", None, "foo", "baz"])
    col = a1t.column(arr)
    assert col.dtype == a1t.string
    assert col.dictionary is not None
    assert len(col.dictionary) == 3  # foo, bar, baz
    back = col.to_arrow()
    assert back.cast(pa.string()).equals(arr) or back.equals(arr)


def test_timestamp_roundtrip():
    arr = pa.array([1, 2, None], type=pa.timestamp("us"))
    col = a1t.column(arr)
    assert col.dtype.kind == "timestamp"
    assert col.to_arrow().equals(arr)


def test_record_batch_roundtrip():
    rb = pa.record_batch({
        "a": pa.array([1, 2, 3], type=pa.int64()),
        "b": pa.array([1.5, None, 3.0]),
        "c": pa.array(["x", "y", "x"]),
    })
    batch = a1t.record_batch(rb)
    assert batch.num_rows == 3
    assert batch.names == ("a", "b", "c")
    back = batch.to_arrow()
    assert back.column(0).equals(rb.column(0))
    assert back.column(1).equals(rb.column(1))
    assert back.column(2).cast(pa.string()).equals(rb.column(2))


def test_record_batch_from_dict():
    batch = a1t.record_batch({"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    assert batch.num_rows == 3
    assert batch["x"].dtype == a1t.int64
    assert batch["y"].dtype == a1t.float64


def test_batch_select_slice():
    batch = a1t.record_batch({"x": [1, 2, 3, 4], "y": [10, 20, 30, 40]})
    sel = batch.select(["y"])
    assert sel.names == ("y",)
    sl = batch.slice(1, 2)
    assert sl.num_rows == 2
    assert sl["x"].to_numpy().tolist() == [2, 3]


def test_concat_batches():
    b1 = a1t.record_batch({"x": [1, 2], "s": ["a", "b"]})
    b2 = a1t.record_batch({"x": [3, 4], "s": ["b", "c"]})
    merged = a1t.concat_batches([b1, b2])
    assert merged.num_rows == 4
    assert merged["x"].to_numpy().tolist() == [1, 2, 3, 4]
    assert merged["s"].to_numpy().tolist() == ["a", "b", "b", "c"]


def test_random_generator_parity():
    gen = RandomDataGenerator(7)
    rb = gen.batch(100, [("k", a1t.string), ("v", a1t.int64),
                         ("f", a1t.float64)], null_probability=0.1)
    batch = a1t.record_batch(rb)
    assert batch.num_rows == 100
    for i, name in enumerate(batch.names):
        assert_column_equal(batch.columns[i], rb.column(i), check_dtype=False)


def test_scalar():
    s = a1t.scalar(5)
    assert s.dtype == a1t.int64
    assert s.as_py() == 5
    s = a1t.scalar(None)
    assert s.as_py() is None
    s = a1t.scalar("hello")
    assert s.as_py() == "hello"


def test_nulls_column():
    col = a1t.nulls(5, a1t.int32)
    assert col.null_count == 5


def test_pytree_flattening():
    import jax

    batch = a1t.record_batch({"x": [1, 2, 3], "s": ["a", "b", "a"]})
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.names == batch.names
    assert rebuilt["s"].dictionary is batch["s"].dictionary

    # jit through a RecordBatch
    @jax.jit
    def f(b):
        return b

    out = f(batch)
    assert out["x"].to_numpy().tolist() == [1, 2, 3]


class TestPyarrowCompatSurface:
    """pyarrow-shaped convenience methods on RecordBatch/Table."""

    def make(self):
        return a1t.record_batch({"x": [3, 1, 2], "y": [1.0, None, 3.0]})

    def test_batch_methods(self):
        b = self.make()
        assert b.shape == (3, 2)
        assert b.column_names == ["x", "y"]
        assert b.nbytes > 0
        assert b.sort_by("x")["x"].to_numpy().tolist() == [1, 2, 3]
        assert b.filter([True, False, True])["x"].to_numpy().tolist() == \
            [3, 2]
        assert b.take(np.array([2, 0]))["x"].to_numpy().tolist() == [2, 3]
        assert b.drop_null()["x"].to_numpy().tolist() == [3, 2]
        b2 = b.append_column("z", [7, 8, 9])
        assert b2.column_names == ["x", "y", "z"]
        assert b2.remove_column(0).column_names == ["y", "z"]
        assert b.rename_columns(["a", "b"]).column_names == ["a", "b"]
        assert b.equals(b) and not b.equals(b2)
        sa = b.to_struct_array()
        assert a1t.RecordBatch.from_struct_array(sa).column_names == \
            ["x", "y"]
        assert a1t.RecordBatch.from_pylist(
            [{"q": 1}, {"q": 2}])["q"].to_numpy().tolist() == [1, 2]
        assert b.drop_null().to_tensor().shape == (2, 2)
        b.validate(full=True)

    def test_table_methods(self):
        from arrow1_tpu.table import Table

        t = Table.from_pydict({"k": [1, 1, 2], "v": [10.0, 20.0, 5.0]})
        assert t.shape == (3, 2)
        agg = t.group_by("k").aggregate([("v", "sum")]).to_pydict()
        assert sorted(zip(agg["k"], agg["v_sum"])) == [(1, 30.0), (2, 5.0)]
        t2 = Table.from_pydict({"k": [1, 2], "w": [100, 200]})
        assert t.join(t2, keys="k", join_type="inner").num_rows == 3
        assert t.sort_by([("v", "descending")]).to_pydict()["v"] == \
            [20.0, 10.0, 5.0]
        assert t.slice(1, 2).num_rows == 2
        assert t.equals(t)
        assert t.select(["v"]).column_names == ["v"]
        assert t.drop("v").column_names == ["k"]
        assert t.to_pandas().shape == (3, 2)
        t.validate(full=True)


class TestTopLevelConveniences:
    def test_pyarrow_shaped_module_functions(self):
        from arrow1_tpu.table import Table

        assert a1t.array([1, 2, 3]).to_numpy().tolist() == [1, 2, 3]
        ca = a1t.chunked_array([[1, 2], [3]])
        assert ca.num_chunks == 2
        assert ca.combine_chunks().to_numpy().tolist() == [1, 2, 3]
        t = a1t.concat_tables([Table.from_pydict({"x": [1]}),
                               Table.from_pydict({"x": [2]})])
        assert t.to_pydict() == {"x": [1, 2]}
        assert a1t.concat_arrays(
            [a1t.array([1]), a1t.array([2])]).to_numpy().tolist() == [1, 2]
        s = a1t.unify_schemas([
            a1t.Schema((a1t.Field("a", a1t.int64, True),)),
            a1t.Schema((a1t.Field("b", a1t.float64, True),))])
        assert [f.name for f in s.fields] == ["a", "b"]
        with pytest.raises(ValueError, match="conflicting"):
            a1t.unify_schemas([
                a1t.Schema((a1t.Field("a", a1t.int64, True),)),
                a1t.Schema((a1t.Field("a", a1t.float64, True),))])
        assert a1t.total_allocated_bytes() >= 0


class TestSchemaMetadata:
    def test_metadata_roundtrip_and_jit(self, tmp_path):
        import jax

        from arrow1_tpu import io as aio

        rb = pa.record_batch({"x": [1, 2]}).replace_schema_metadata(
            {"owner": "ops", "v": "7"})
        b = a1t.record_batch(rb)
        assert b.schema.metadata_dict() == {b"owner": b"ops", b"v": b"7"}
        assert b.to_arrow().schema.metadata == {b"owner": b"ops", b"v": b"7"}
        path = str(tmp_path / "m.arrow")
        aio.write_ipc(b, path)
        assert aio.read_ipc(path).combine_chunks().schema.metadata_dict() \
            == {b"owner": b"ops", b"v": b"7"}
        b2 = b.replace_schema_metadata({"k": "v"})
        assert b2.schema.metadata_dict() == {b"k": b"v"}
        assert b2.replace_schema_metadata().schema.metadata_dict() is None
        out = jax.jit(lambda batch: batch)(b2)
        assert out.schema.metadata_dict() == {b"k": b"v"}
