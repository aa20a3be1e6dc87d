"""Parity tests for the two-level MXU grouped-aggregation kernel
(kernels/segsum2.py) against the XLA scatter oracle, in interpret mode.

Covers: multi-column specs, validity masks, count-only columns, 64-bit
carry paths (values spanning 1..8 planes), padding, dead rows (gid=G),
and the engine-level fast-path integration (ops/groupby.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrow1_tpu.kernels.segsum2 import (ColPlanes, plan_planes,
                                        segment_sums_mxu,
                                        segment_sums_oracle, TILE2)


def _words(vals_u64):
    v = np.asarray(vals_u64, dtype=np.uint64)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    hi = (v >> np.uint64(32)).astype(np.uint32).view(np.int32)
    return (jnp.asarray(lo), jnp.asarray(hi))


def _check(gid, cols, G):
    occ, res = segment_sums_mxu(jnp.asarray(gid, jnp.int32), cols, G,
                                interpret=True)
    occ_o, res_o = segment_sums_oracle(jnp.asarray(gid, jnp.int32), cols, G)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_o))
    for (cnt, s), (cnt_o, s_o) in zip(res, res_o):
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_o))
        if s_o is None:
            assert s is None
        else:
            np.testing.assert_array_equal(np.asarray(s), np.asarray(s_o))


class TestSegsum2:
    def test_basic_sum_count(self, rng):
        n, G = 3000, 256
        gid = rng.integers(0, G, n)
        vals = rng.integers(0, 1 << 20, n).astype(np.uint64)
        bias, np_ = plan_planes(0, 1 << 20)
        assert np_ == 3
        cols = [ColPlanes(_words(vals), None, np_)]
        _check(gid, cols, G)

    def test_planes_grid(self, rng):
        n, G = 2048, 128
        gid = rng.integers(0, G, n)
        for bits in (7, 8, 15, 16, 31, 32, 39, 63):
            vals = rng.integers(0, 1 << bits, n, dtype=np.uint64)
            np_ = (bits + 7) // 8
            cols = [ColPlanes(_words(vals), None, np_)]
            _check(gid, cols, G)

    def test_full_u64_range_carry(self, rng):
        # all-ones values force max plane sums and u32 carries
        n, G = TILE2 * 3, 128
        gid = rng.integers(0, G, n)
        vals = np.full(n, 0xFFFFFFFFFFFFFFFF, np.uint64)
        cols = [ColPlanes(_words(vals), None, 8)]
        _check(gid, cols, G)

    def test_validity_and_count_only(self, rng):
        n, G = 5000, 384
        gid = rng.integers(0, G, n)
        vals = rng.integers(0, 1 << 30, n).astype(np.uint64)
        live = jnp.asarray(rng.random(n) > 0.3)
        cols = [ColPlanes(_words(vals), live, 4),
                ColPlanes((), jnp.asarray(rng.random(n) > 0.5), 0),
                ColPlanes(_words(vals), None, 4)]
        _check(gid, cols, G)

    def test_dead_rows_and_padding(self, rng):
        # gid == G marks dead/pad rows; n not a TILE2 multiple
        n, G = TILE2 + 77, 128
        gid = rng.integers(0, G + 1, n)  # includes dead rows
        vals = rng.integers(0, 1 << 16, n).astype(np.uint64)
        cols = [ColPlanes(_words(vals), None, 2)]
        _check(gid, cols, G)

    def test_large_g(self, rng):
        n, G = 4096, 1 << 13
        gid = rng.integers(0, G, n)
        vals = rng.integers(0, 1 << 24, n).astype(np.uint64)
        cols = [ColPlanes(_words(vals), None, 3)]
        _check(gid, cols, G)

    def test_empty_groups_and_skew(self, rng):
        n, G = 4000, 512
        gid = np.where(rng.random(n) < 0.9, 7, rng.integers(0, G, n))
        vals = rng.integers(0, 1 << 40, n).astype(np.uint64)
        cols = [ColPlanes(_words(vals), None, 5)]
        _check(gid, cols, G)

    def test_plan_planes_bias(self):
        bias, np_ = plan_planes(-100, 155)
        assert bias == -100 and np_ == 1
        bias, np_ = plan_planes(5, 5)
        assert np_ == 1
        bias, np_ = plan_planes(-(1 << 62), 1 << 62)
        assert np_ == 8
