"""Differential fuzzing vs the pyarrow oracle.

SURVEY.md §4.3: the reference fuzzes its IPC/Parquet decoders with
libFuzzer. The analogous attack surface here is the kernel layer, and the
right harness is differential: random expression trees over random tables
executed by both engines must agree exactly. Seeded and bounded so CI is
deterministic.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.testing import RandomDataGenerator, assert_equals_arrow

BINARY_NUM = ["add", "subtract", "multiply"]
COMPARE = ["equal", "not_equal", "less", "less_equal", "greater",
           "greater_equal"]
BOOL_BIN = ["and_kleene", "or_kleene", "xor", "and_not"]


def random_table(rng, n=120):
    gen = RandomDataGenerator(int(rng.integers(0, 2**31)))
    return pa.record_batch({
        "a": gen.numeric(n, a1t.int64, null_probability=float(rng.random()) * 0.4,
                         low=-1000, high=1000),
        "b": gen.numeric(n, a1t.int64, null_probability=float(rng.random()) * 0.4,
                         low=-1000, high=1000),
        "x": gen.numeric(n, a1t.float64, null_probability=float(rng.random()) * 0.4),
        "s": gen.strings(n, num_unique=6, null_probability=0.2),
    })


def random_numeric_expr(rng, depth=0):
    """Build parallel (a1t Expression, pyarrow evaluator) pairs."""
    if depth >= 3 or rng.random() < 0.3:
        name = rng.choice(["a", "b"])
        return a1t.field(name), lambda rb: rb.column(str(name))
    op = rng.choice(BINARY_NUM)
    l_e, l_f = random_numeric_expr(rng, depth + 1)
    r_e, r_f = random_numeric_expr(rng, depth + 1)
    e = l_e._bin(op, r_e)
    return e, lambda rb, op=op, l_f=l_f, r_f=r_f: getattr(pc, op)(
        l_f(rb), r_f(rb))


def random_bool_expr(rng, depth=0):
    if depth >= 2 or rng.random() < 0.4:
        op = rng.choice(COMPARE)
        l_e, l_f = random_numeric_expr(rng, depth + 1)
        r_e, r_f = random_numeric_expr(rng, depth + 1)
        return l_e._bin(op, r_e), \
            lambda rb, op=op, l_f=l_f, r_f=r_f: getattr(pc, op)(
                l_f(rb), r_f(rb))
    op = rng.choice(BOOL_BIN)
    l_e, l_f = random_bool_expr(rng, depth + 1)
    r_e, r_f = random_bool_expr(rng, depth + 1)
    return l_e._bin(op, r_e), \
        lambda rb, op=op, l_f=l_f, r_f=r_f: getattr(pc, op)(l_f(rb), r_f(rb))


class TestDifferentialFuzz:
    @pytest.mark.parametrize("seed", range(25))
    def test_expression_trees(self, seed):
        rng = np.random.default_rng(seed)
        rb = random_table(rng)
        batch = a1t.record_batch(rb)
        e, oracle = random_numeric_expr(rng)
        got = e.execute(batch)
        exp = oracle(rb)
        assert_equals_arrow(got, exp)

    @pytest.mark.parametrize("seed", range(25))
    def test_predicate_then_filter(self, seed):
        rng = np.random.default_rng(1000 + seed)
        rb = random_table(rng)
        batch = a1t.record_batch(rb)
        e, oracle = random_bool_expr(rng)
        mask = e.execute(batch)
        exp_mask = oracle(rb)
        assert_equals_arrow(mask, exp_mask)
        got = ac.filter(batch, mask)
        exp = rb.filter(exp_mask)
        assert got.num_rows == exp.num_rows
        for name in ("a", "b"):
            assert got[name].to_arrow().equals(exp.column(name))

    @pytest.mark.parametrize("seed", range(10))
    def test_random_pipeline(self, seed):
        rng = np.random.default_rng(2000 + seed)
        rb = random_table(rng, n=200)
        batch = a1t.record_batch(rb)
        e, oracle = random_bool_expr(rng)
        mask = e.execute(batch)
        hot = ac.filter(batch, mask)
        hot_pa = rb.filter(oracle(rb))
        agg = a1t.group_by(hot, ["s"], [("a", "sum"), ("a", "count")])
        exp = pa.Table.from_batches([hot_pa]).group_by(["s"]).aggregate(
            [("a", "sum"), ("a", "count")])
        g = sorted(agg.to_arrow().to_pylist(), key=lambda r: repr(r["s"]))
        x = sorted(exp.to_pylist(), key=lambda r: repr(r["s"]))
        assert g == x


class TestJoinFuzz:
    """Randomized join validation — the component with no reference
    implementation gets the heaviest differential testing."""

    @pytest.mark.parametrize("seed", range(15))
    def test_random_joins(self, seed):
        rng = np.random.default_rng(3000 + seed)
        nl = int(rng.integers(20, 200))
        nr = int(rng.integers(5, 120))
        card = int(rng.integers(2, 40))
        null_p = float(rng.random()) * 0.3
        gen_l = RandomDataGenerator(int(rng.integers(0, 2**31)))
        gen_r = RandomDataGenerator(int(rng.integers(0, 2**31)))
        left = pa.record_batch({
            "k": gen_l.numeric(nl, a1t.int64, null_probability=null_p,
                               low=0, high=card),
            "lv": pa.array(np.arange(nl, dtype=np.int64)),
        })
        right = pa.record_batch({
            "k": gen_r.numeric(nr, a1t.int64, null_probability=null_p,
                               low=0, high=card),
            "rv": pa.array(np.arange(nr, dtype=np.int64)),
        })
        jt = ["inner", "left outer", "right outer", "full outer",
              "left semi", "left anti"][seed % 6]
        got = a1t.join(a1t.record_batch(left), a1t.record_batch(right),
                       keys=["k"], join_type=jt)
        exp = pa.Table.from_batches([left]).join(
            pa.Table.from_batches([right]), keys=["k"], join_type=jt)
        from test_groupby_join import assert_same_rows

        assert got.num_rows == exp.num_rows, (seed, jt)
        assert_same_rows(got, exp)
