"""Expression system: execute/bind/fold/simplify + set lookup parity."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.expr import (Call, Literal, field, fold_constants, literal,
                             simplify_with_guarantee)
from arrow1_tpu.testing import assert_equals_arrow

RB = pa.record_batch({
    "x": pa.array([1, 2, None, 4, 5], type=pa.int64()),
    "y": pa.array([10.0, 20.0, 30.0, None, 50.0]),
    "s": pa.array(["a", "b", "a", "c", None]),
})


def batch():
    return a1t.record_batch(RB)


class TestExecute:
    def test_field(self):
        assert field("x").execute(batch()).to_arrow().equals(RB.column(0))

    def test_comparison(self):
        got = (field("x") > 2).execute(batch())
        assert_equals_arrow(got, pc.greater(RB.column(0), pa.scalar(2)))

    def test_arith_chain(self):
        e = (field("x") * 2 + field("y")) / 3
        got = e.execute(batch())
        exp = pc.divide(pc.add(pc.multiply(RB.column(0), pa.scalar(2)),
                               RB.column(1)), pa.scalar(3))
        assert_equals_arrow(got, exp, approx=True)

    def test_kleene_combination(self):
        e = (field("x") > 1) & (field("y") < 40.0)
        got = e.execute(batch())
        exp = pc.and_kleene(pc.greater(RB.column(0), pa.scalar(1)),
                            pc.less(RB.column(1), pa.scalar(40.0)))
        assert_equals_arrow(got, exp)

    def test_string_predicate(self):
        e = field("s") == "a"
        got = e.execute(batch())
        assert_equals_arrow(got, pc.equal(RB.column(2), pa.scalar("a")))

    def test_is_valid(self):
        got = field("x").is_valid().execute(batch())
        assert_equals_arrow(got, pc.is_valid(RB.column(0)))

    def test_isin(self):
        e = field("x").isin([1, 4, 9])
        got = e.execute(batch())
        exp = pc.is_in(RB.column(0), value_set=pa.array([1, 4, 9]))
        assert_equals_arrow(got, exp)

    def test_cast_expr(self):
        e = field("x").cast(a1t.float64)
        got = e.execute(batch())
        assert_equals_arrow(got, RB.column(0).cast(pa.float64()))

    def test_filter_with_expression(self):
        mask = ((field("x") > 1) & (field("y") < 40.0)).execute(batch())
        got = ac.filter(batch(), mask)
        exp_mask = pc.and_kleene(pc.greater(RB.column(0), pa.scalar(1)),
                                 pc.less(RB.column(1), pa.scalar(40.0)))
        exp = pc.filter(RB, exp_mask)
        assert got.num_rows == exp.num_rows


class TestSetLookup:
    def test_is_in_with_null_in_set(self):
        a = pa.array([1, None, 3], type=pa.int64())
        got = ac.is_in(a, value_set=[1, None])
        exp = pc.is_in(a, value_set=pa.array([1, None]))
        assert_equals_arrow(got, exp)

    def test_is_in_skip_nulls(self):
        a = pa.array([1, None, 3], type=pa.int64())
        got = ac.is_in(a, value_set=[1, None], skip_nulls=True)
        exp = pc.is_in(a, value_set=pa.array([1, None]), skip_nulls=True)
        assert_equals_arrow(got, exp)

    def test_index_in(self):
        a = pa.array([9, 4, None, 1, 7], type=pa.int64())
        got = ac.index_in(a, value_set=[1, 4, 9])
        exp = pc.index_in(a, value_set=pa.array([1, 4, 9]))
        assert_equals_arrow(got, exp)

    def test_index_in_strings(self):
        a = pa.array(["b", "z", "a", None])
        got = ac.index_in(a, value_set=["a", "b"])
        exp = pc.index_in(a, value_set=pa.array(["a", "b"]))
        assert_equals_arrow(got, exp)


class TestBindFoldSimplify:
    def test_bind_validates_fields(self):
        e = field("missing") > 1
        with pytest.raises(KeyError):
            e.bind(batch().schema)
        (field("x") > 1).bind(batch().schema)  # no raise

    def test_fields(self):
        e = (field("x") > 1) & (field("y") < field("x"))
        assert e.fields() == {"x", "y"}

    def test_fold_constants(self):
        e = literal(2) + literal(3)
        folded = fold_constants(e)
        assert isinstance(folded, Literal)
        assert folded.value.as_py() == 5

    def test_fold_partial(self):
        e = field("x") + (literal(2) * literal(3))
        folded = fold_constants(e)
        assert isinstance(folded, Call)
        assert isinstance(folded.args[1], Literal)
        assert folded.args[1].value.as_py() == 6

    def test_simplify_with_guarantee_prunes(self):
        # partition pruning: guarantee year == 2021 makes filter decidable
        filt = field("year") == 2020
        guarantee = field("year") == 2021
        s = simplify_with_guarantee(filt, guarantee)
        assert isinstance(s, Literal)
        assert s.value.as_py() is False

    def test_simplify_with_guarantee_satisfied(self):
        filt = (field("year") == 2021) & (field("x") > 3)
        guarantee = field("year") == 2021
        s = simplify_with_guarantee(filt, guarantee)
        # collapses to just the x predicate
        assert s.fields() == {"x"}

    def test_simplify_keeps_undecidable(self):
        filt = field("x") > 3
        s = simplify_with_guarantee(filt, field("year") == 2021)
        assert s.fields() == {"x"}


class TestCallFactory:
    def test_registry_functions_in_query(self):
        b = a1t.record_batch({"x": [1.0, 4.0, 9.0], "f": [0.5, -0.5, 0.9]})
        got = (a1t.query(b)
               .project([a1t.call("sqrt", [a1t.field("x")]),
                         a1t.call("round_to_multiple", [a1t.field("x")],
                                  multiple=5.0)],
                        ["sx", "r5"])
               .to_batch())
        assert got["sx"].to_numpy().tolist() == [1.0, 2.0, 3.0]
        assert got["r5"].to_numpy().tolist() == [0.0, 5.0, 10.0]

    def test_call_with_literal_arg(self):
        b = a1t.record_batch({"f": [0.5, -0.8]})
        got = (a1t.query(b)
               .filter(a1t.call("greater",
                                [a1t.call("abs", [a1t.field("f")]), 0.6]))
               .to_batch())
        assert got["f"].to_numpy().tolist() == [-0.8]


class TestUnionNode:
    def test_plan_union(self):
        import arrow1_tpu as a1t
        from arrow1_tpu.exec.plan import (ExecPlan, sink_node, source_node,
                                          union_node)

        b1 = a1t.record_batch({"x": [1, 2]})
        b2 = a1t.record_batch({"x": [3]})
        b3 = a1t.record_batch({"x": [4, 5]})
        plan = ExecPlan()
        s1 = source_node(plan, [b1, b2])
        s2 = source_node(plan, [b3])
        u = union_node(plan, [s1, s2])
        sink = sink_node(plan, u)
        plan.run()
        got = sink.result.combine_chunks()
        assert got.column("x").to_numpy().tolist() == [1, 2, 3, 4, 5]

    def test_acero_union_declaration(self):
        import arrow1_tpu as a1t
        from arrow1_tpu.acero import Declaration, TableSourceNodeOptions

        t1 = a1t.record_batch({"x": [1, 2]})
        t2 = a1t.record_batch({"x": [9]})
        decl = Declaration("union", None, inputs=[
            Declaration("table_source", TableSourceNodeOptions(t1)),
            Declaration("table_source", TableSourceNodeOptions(t2)),
        ])
        got = decl.to_table().combine_chunks()
        assert got.column("x").to_numpy().tolist() == [1, 2, 9]
