"""Exactness of the butterfly compaction kernels (v7 champion, v12
candidate) against the reference semantics (vector_selection.cc:570-830
dense copy), in interpret mode, plus the A1T_COMPACT_KERNEL dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrow1_tpu.kernels.compaction_v4 import compact


@pytest.mark.parametrize("t_tiles", [2, 4])
@pytest.mark.parametrize("sel_p", [0.0, 0.03, 0.5, 1.0])
def test_compact_v7_exact(rng, t_tiles, sel_p):
    from arrow1_tpu.kernels.compaction_v7 import compact_v7

    rows = 8
    n = 2 * t_tiles * rows * 128
    key = rng.integers(0, 1 << 40, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.random(n).astype(np.float32)
    mask = rng.random(n) < sel_p
    (ok, ov, of), count = compact_v7(
        jnp.asarray(mask), (jnp.asarray(key), jnp.asarray(v),
                            jnp.asarray(f)),
        interpret=True, rows=rows, t_tiles=t_tiles)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
    np.testing.assert_array_equal(np.asarray(ov[:cnt]), v[mask])
    np.testing.assert_array_equal(np.asarray(of[:cnt]), f[mask])


def test_compact_dispatch_v7(rng, monkeypatch):
    monkeypatch.setenv("A1T_COMPACT_KERNEL", "v7:2")
    n = 3000  # exercises padding to the T*R*128 multiple
    key = rng.integers(0, 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.4
    (ok,), count = compact(jnp.asarray(mask), (jnp.asarray(key),),
                           interpret=True)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("rows", [8, 32])
@pytest.mark.parametrize("band", [-1, 0])
@pytest.mark.parametrize("sel_p", [0.0, 0.03, 0.13, 0.5, 0.97, 1.0])
def test_compact_v12_exact(rng, rows, band, sel_p):
    from arrow1_tpu.kernels.compaction_v12 import compact_v12

    n = 5 * rows * 128
    key = rng.integers(0, 1 << 40, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.random(n).astype(np.float32)
    mask = rng.random(n) < sel_p
    (ok, ov, of), count = compact_v12(
        jnp.asarray(mask), (jnp.asarray(key), jnp.asarray(v),
                            jnp.asarray(f)),
        interpret=True, rows=rows, band=band)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
    np.testing.assert_array_equal(np.asarray(ov[:cnt]), v[mask])
    np.testing.assert_array_equal(np.asarray(of[:cnt]), f[mask])


def test_compact_v12_blocky(rng):
    """Dense prefix -> sparse stretch -> all-zero tail: stresses the band
    buckets, runless partial rows, and the overlapping-DMA rewrite."""
    from arrow1_tpu.kernels.compaction_v12 import compact_v12

    rows = 16
    n = 6 * rows * 128
    key = np.arange(n).astype(np.int64)
    mask = np.zeros(n, bool)
    mask[:n // 3] = True
    mask[n // 3:2 * n // 3] = rng.random(n // 3) < 0.05
    (ok,), count = compact_v12(jnp.asarray(mask), (jnp.asarray(key),),
                               interpret=True, rows=rows, band=0)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("choice", ["v12", "v12:32:0"])
def test_compact_dispatch_v12(rng, monkeypatch, choice):
    monkeypatch.setenv("A1T_COMPACT_KERNEL", choice)
    n = 3000  # exercises padding
    key = rng.integers(0, 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.4
    (ok,), count = compact(jnp.asarray(mask), (jnp.asarray(key),),
                           interpret=True)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("rows", [8, 32])
@pytest.mark.parametrize("band", [-1, 0])
@pytest.mark.parametrize("sel_p", [0.0, 0.03, 0.13, 0.5, 0.97, 1.0])
def test_compact_v14_exact(rng, rows, band, sel_p):
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    n = 5 * rows * 128
    key = rng.integers(0, 1 << 40, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.random(n).astype(np.float32)
    mask = rng.random(n) < sel_p
    (ok, ov, of), count = compact_v14(
        jnp.asarray(mask), (jnp.asarray(key), jnp.asarray(v),
                            jnp.asarray(f)),
        interpret=True, rows=rows, band=band)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
    np.testing.assert_array_equal(np.asarray(ov[:cnt]), v[mask])
    np.testing.assert_array_equal(np.asarray(of[:cnt]), f[mask])


def test_compact_v14_blocky(rng):
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    rows = 16
    n = 6 * rows * 128
    key = np.arange(n).astype(np.int64)
    mask = np.zeros(n, bool)
    mask[:n // 3] = True
    mask[n // 3:2 * n // 3] = rng.random(n // 3) < 0.05
    (ok,), count = compact_v14(jnp.asarray(mask), (jnp.asarray(key),),
                               interpret=True, rows=rows, band=0)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("choice", ["v14", "v14:32:0"])
def test_compact_dispatch_v14(rng, monkeypatch, choice):
    monkeypatch.setenv("A1T_COMPACT_KERNEL", choice)
    n = 3000
    key = rng.integers(0, 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.4
    (ok,), count = compact(jnp.asarray(mask), (jnp.asarray(key),),
                           interpret=True)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("variant", ["v4", "v7", "v12", "v14"])
def test_compact_out_limit(rng, variant):
    """out_limit (static survivor bound) truncates outputs without
    changing the live prefix — the O(sel*n) consumer-traffic contract
    added in round 4."""
    rows = 8
    n = 4 * rows * 128
    key = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.25
    cnt_true = int(mask.sum())
    lim = (cnt_true + 255) // 128 * 128  # bound above the true count

    if variant == "v4":
        from arrow1_tpu.kernels.compaction_v4 import compact_v4 as fn
        kw = dict(rows=rows)
    elif variant == "v7":
        from arrow1_tpu.kernels.compaction_v7 import compact_v7 as fn
        kw = dict(rows=rows, t_tiles=2)
    elif variant == "v12":
        from arrow1_tpu.kernels.compaction_v12 import compact_v12 as fn
        kw = dict(rows=rows, band=0)
    else:
        from arrow1_tpu.kernels.compaction_v14 import compact_v14 as fn
        kw = dict(rows=rows, band=0)

    (ok, ov), count = fn(jnp.asarray(mask),
                         (jnp.asarray(key), jnp.asarray(v)),
                         interpret=True, out_limit=lim, **kw)
    cnt = int(count)
    assert cnt == cnt_true
    assert ok.shape[0] == lim and ov.shape[0] == lim
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
    np.testing.assert_array_equal(np.asarray(ov[:cnt]), v[mask])


def test_compact_planes_meta_input(rng):
    """Plane-native input mode: pre-split i32 word planes + static
    planes_meta reproduce the i64-column path bit-exactly (the engine's
    ingest-time storage layout for 64-bit columns, round 4)."""
    import jax.numpy as jnp2

    from arrow1_tpu.kernels.compaction_v4 import _to_words
    from arrow1_tpu.kernels.compaction_v7 import compact_v7
    from arrow1_tpu.kernels.compaction_v12 import compact_v12

    rows = 8
    n = 4 * rows * 128
    key = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    fb = rng.standard_normal(n).view(np.int64)
    mask = rng.random(n) < 0.4
    cols = (jnp2.asarray(key), jnp2.asarray(fb))

    plane_arrs, pm = [], []
    for c in cols:
        ws, meta = _to_words(c)
        pm.append((len(ws), meta))
        plane_arrs.extend(ws)
    pm = tuple(pm)
    plane_arrs = tuple(plane_arrs)

    for fn, kw in ((compact_v7, dict(rows=rows, t_tiles=2)),
                   (compact_v12, dict(rows=rows, band=0))):
        (a_ref, b_ref), cnt_ref = fn(jnp2.asarray(mask), cols,
                                     interpret=True, **kw)
        (a_pl, b_pl), cnt_pl = fn(jnp2.asarray(mask), plane_arrs,
                                  interpret=True, planes_meta=pm, **kw)
        cnt = int(cnt_ref)
        assert cnt == int(cnt_pl) == int(mask.sum())
        np.testing.assert_array_equal(np.asarray(a_pl[:cnt]),
                                      np.asarray(a_ref[:cnt]))
        np.testing.assert_array_equal(np.asarray(b_pl[:cnt]),
                                      np.asarray(b_ref[:cnt]))
        np.testing.assert_array_equal(np.asarray(a_ref[:cnt]), key[mask])


def test_compact_dispatch_v14(rng, monkeypatch):
    monkeypatch.setenv("A1T_COMPACT_KERNEL", "v14:8:0")
    n = 3000  # exercises padding to the R*128 multiple
    key = rng.integers(0, 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.4
    (ok,), count = compact(jnp.asarray(mask), (jnp.asarray(key),),
                           interpret=True)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])


@pytest.mark.parametrize("sel_p", [0.0, 0.13, 0.5, 1.0])
def test_compact_v14_i8_dot_exact(rng, sel_p):
    """The int8 routing-dot variant (v5e MXU int8 = 2x bf16; probed
    exact on real TPU, benchmarks/r5) in interpret mode."""
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    rows = 8
    n = 4 * rows * 128
    key = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < sel_p
    (ok, ov), count = compact_v14(
        jnp.asarray(mask), (jnp.asarray(key), jnp.asarray(v)),
        interpret=True, rows=rows, band=0, dot="i8")
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
    np.testing.assert_array_equal(np.asarray(ov[:cnt]), v[mask])


def test_compact_dispatch_v13_aliases_to_v14(rng, monkeypatch):
    """v13 was deleted in the r5 consolidation (dead by measurement,
    r4 probe_v13: 76.6 ms relayout); the dispatch alias keeps old
    A1T_COMPACT_KERNEL settings working."""
    monkeypatch.setenv("A1T_COMPACT_KERNEL", "v13")
    n = 3000
    key = rng.integers(0, 1 << 30, n).astype(np.int64)
    mask = rng.random(n) < 0.4
    (ok,), count = compact(jnp.asarray(mask), (jnp.asarray(key),),
                           interpret=True)
    cnt = int(count)
    assert cnt == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ok[:cnt]), key[mask])
