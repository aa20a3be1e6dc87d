"""compact_fused (v15: in-kernel predicate + projection) exactness in
interpret mode: movement bit-exact, projection bit-exact vs the same
float-float algorithm on host, overflow flag on band clipping."""

import numpy as np
import pytest

import jax.numpy as jnp

from arrow1_tpu.kernels.compaction_v15 import compact_fused
from arrow1_tpu.kernels.fused_ops import flagship_filter_project
from arrow1_tpu.kernels.dd import np_dd_split


def _planes(key, v, f):
    fh, fl = np_dd_split(f)
    return tuple(jnp.asarray(x) for x in (
        (key & 0xFFFFFFFF).astype(np.uint32).view(np.int32).copy(),
        (key >> 32).astype(np.int32),
        (v & 0xFFFFFFFF).astype(np.uint32).view(np.int32).copy(),
        (v >> 32).astype(np.int32),
        fh.view(np.int32).copy(), fl.view(np.int32).copy()))


def _params(vthr, thresh):
    th = np.float32(thresh)
    tl = np.float32(np.float64(thresh) - np.float64(th))
    return jnp.asarray(np.array(
        [vthr & 0xFFFFFFFF, (vthr >> 32) & 0xFFFFFFFF,
         th.view(np.int32), tl.view(np.int32), 0, 0],
        np.int64).astype(np.uint32).view(np.int32))


def _np_dd(vlo, vhi, fh, fl):
    def two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    a = vhi.astype(np.float32) * np.float32(2 ** 32)
    top = ((vlo.view(np.uint32) >> 16).astype(np.float32)
           * np.float32(65536.0))
    bot = (vlo.view(np.uint32) & 0xFFFF).astype(np.float32)
    bh, bl = two_sum(top, bot)
    s, e = two_sum(a, bh)
    vh = s + (e + bl)
    vl = (e + bl) - (vh - s)
    s2, e2 = two_sum(vh * np.float32(2), fh)
    e2 = e2 + vl * np.float32(2) + fl
    ph = s2 + e2
    return ph, e2 - (ph - s2)


@pytest.mark.parametrize("sel_p", [0.0, 0.13, 0.5, 0.97, 1.0])
@pytest.mark.parametrize("rows", [8, 16])
def test_v15_flagship_exact(sel_p, rows):
    rng = np.random.default_rng(int(sel_p * 100) + rows)
    n = 5 * rows * 128
    key = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.standard_normal(n)
    planes = _planes(key, v, f)
    # thresh picked for the target selectivity of the f factor
    thresh = float(np.quantile(f, 1.0 - max(sel_p, 1e-9))) \
        if sel_p < 1.0 else float(f.min() - 1.0)
    vthr = -(1 << 31)
    outs, count, ovf = compact_fused(
        planes, flagship_filter_project, 4, params=_params(vthr, thresh),
        interpret=True, rows=rows, band=rows + 9)
    fh, fl = np_dd_split(f)
    maskH = ((fh.astype(np.float64) + fl.astype(np.float64)) > thresh) \
        & (v > vthr)
    cnt = int(count)
    assert cnt == int(maskH.sum())
    assert not bool(ovf)
    gotk = (np.asarray(outs[1][:cnt]).astype(np.int64) << 32) \
        | np.asarray(outs[0][:cnt]).view(np.uint32).astype(np.int64)
    np.testing.assert_array_equal(gotk, key[maskH])
    ph, plo = _np_dd((v & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
                     (v >> 32).astype(np.int32), fh, fl)
    np.testing.assert_array_equal(
        np.asarray(outs[2][:cnt]).view(np.float32), ph[maskH])
    np.testing.assert_array_equal(
        np.asarray(outs[3][:cnt]).view(np.float32), plo[maskH])


def test_v15_band_overflow_flag():
    """A band too small for the survivor rate must raise the flag (the
    two-phase replan signal), not silently corrupt."""
    rng = np.random.default_rng(7)
    rows = 8
    n = 4 * rows * 128
    key = rng.integers(0, 1 << 20, n).astype(np.int64)
    v = np.full(n, 5, np.int64)          # all pass the v predicate
    f = np.abs(rng.standard_normal(n)) + 1.0   # all pass f > 0
    planes = _planes(key, v, f)
    outs, count, ovf = compact_fused(
        planes, flagship_filter_project, 4, params=_params(0, 0.0),
        interpret=True, rows=rows, band=4)   # band 4 << needed rows+1
    assert bool(ovf)
    # full-band re-run succeeds
    outs, count, ovf = compact_fused(
        planes, flagship_filter_project, 4, params=_params(0, 0.0),
        interpret=True, rows=rows, band=rows + 9)
    assert not bool(ovf)
    assert int(count) == n


def test_v15_params_change_no_recompile_semantics():
    """Same closure, different params -> different masks (params are
    runtime scalars, not baked constants)."""
    rng = np.random.default_rng(3)
    rows = 8
    n = 2 * rows * 128
    key = rng.integers(0, 100, n).astype(np.int64)
    v = rng.integers(-50, 50, n).astype(np.int64)
    f = rng.standard_normal(n)
    planes = _planes(key, v, f)
    c1 = int(compact_fused(planes, flagship_filter_project, 4,
                           params=_params(0, 0.0), interpret=True,
                           rows=rows, band=rows + 9)[1])
    c2 = int(compact_fused(planes, flagship_filter_project, 4,
                           params=_params(-100, -10.0), interpret=True,
                           rows=rows, band=rows + 9)[1])
    fh, fl = np_dd_split(f)
    fdd = fh.astype(np.float64) + fl.astype(np.float64)
    assert c1 == int(((fdd > 0) & (v > 0)).sum())
    assert c2 == int(((fdd > -10.0) & (v > -100)).sum())
    assert c1 != c2


def test_v15_auto_replan():
    """compact_fused_auto re-runs with the full window when the
    sel_hint-sized band clips (two-phase replan)."""
    from arrow1_tpu.kernels.compaction_v15 import compact_fused_auto

    rng = np.random.default_rng(11)
    rows = 8
    n = 4 * rows * 128
    key = rng.integers(0, 1 << 20, n).astype(np.int64)
    v = np.full(n, 5, np.int64)
    f = np.abs(rng.standard_normal(n)) + 1.0   # everything survives
    planes = _planes(key, v, f)
    outs, count = compact_fused_auto(
        planes, flagship_filter_project, 4, params=_params(0, 0.0),
        interpret=True, rows=rows, sel_hint=0.1)   # band far too small
    assert int(count) == n
    gotk = (np.asarray(outs[1][:n]).astype(np.int64) << 32) \
        | np.asarray(outs[0][:n]).view(np.uint32).astype(np.int64)
    np.testing.assert_array_equal(gotk, key)


@pytest.mark.parametrize("split", [2])
def test_v15_split_halves_exact(split):
    """The split half-stack form (MXU/VPU overlap lever) is bit-exact
    vs the single-stack form."""
    rng = np.random.default_rng(21)
    rows = 8
    n = 4 * rows * 128
    key = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.standard_normal(n)
    planes = _planes(key, v, f)
    o1, c1, _ = compact_fused(planes, flagship_filter_project, 4,
                              params=_params(0, 0.0), interpret=True,
                              rows=rows, band=rows + 9)
    o2, c2, _ = compact_fused(planes, flagship_filter_project, 4,
                              params=_params(0, 0.0), interpret=True,
                              rows=rows, band=rows + 9, split=split)
    assert int(c1) == int(c2)
    cnt = int(c1)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a[:cnt]),
                                      np.asarray(b[:cnt]))
