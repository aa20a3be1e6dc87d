"""Butterfly stream compaction — v4.

v3 (compaction_v3.py) spends its per-tile time in per-row one-hot dots
(building lane indices) and `take_along_axis` lane gathers. v4 replaces
ALL data movement with 14 rounds of static lane-rolls + selects:

  compaction butterfly (7 rounds): every selected element carries a
    left-shift distance ``dist = pos+1 - incl`` (its deficit); for bit k,
    elements whose dist has bit k set move left by 2^k. Left-pack
    distances are non-decreasing along a row, which makes the routing
    collision-free per round (property-tested exhaustively; the classic
    SIMD vcompress emulation).
  rotation butterfly (7 rounds): each row's packed run is rotated right
    by its output start lane (rem + excl_row) % 128 — bit k of the
    rotation selects `roll(x, 2^k)` per row (static roll amount, per-row
    select mask).

Static-shift lane rolls are native vector-permute hardware; there are no
gathers and no per-row MXU dots left. The only matmuls are the [R,128]
within-row prefix (tri matmul) and the [R,R] row-offset scan.

Merge/flush structure follows v3 (value-space accumulator, aligned DMA
flushes) with two upgrades: the per-row merge masks are computed once
per tile (not once per word), and the flush DMA for all words moves as
one strided [W,R,128] block into a single [W, rows, 128] output.

Reference semantics: filter materialization per
cpp/src/arrow/compute/kernels/vector_selection.cc:570-830 (drop-null
dense copy); this kernel is the engine's TPU fast path for it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_v4", "compact", "best_rows", "TILE_V4"]

L = 128
HP = dict(preferred_element_type=jnp.float32,
          precision=jax.lax.Precision.HIGHEST)
DP = dict(preferred_element_type=jnp.float32)


def _butterfly_pack(vals, sel, dist):
    """Left-pack selected lanes of each row. vals: list of [R,L] i32;
    sel: [R,L] bool; dist: [R,L] i32 left-shift amounts (0 for
    unselected). Returns packed vals (lanes 0..cnt_r-1 valid per row)."""
    # sel rides as an i32 0/1 plane: Mosaic's lane rotate only handles
    # 32-bit data (no i1 rotate)
    for k in range(7):
        s = 1 << k
        # left-roll by s == right-roll by L-s (pltpu.roll wants shift>=0)
        cand = [pltpu.roll(v, L - s, 1) for v in vals]
        cd = pltpu.roll(dist, L - s, 1)
        cs = pltpu.roll(sel, L - s, 1)
        bit = jnp.int32(s)
        take = (cs != 0) & ((cd & bit) != 0)
        stays = (dist & bit) == 0
        vals = [jnp.where(take, cv, v) for cv, v in zip(cand, vals)]
        dist = jnp.where(take, cd, dist)
        sel = jnp.where(take, jnp.int32(1),
                        jnp.where(stays, sel, jnp.int32(0)))
    return vals


def _rotate_rows(vals, rot):
    """Rotate each row right by rot[r] (rot: [R,1] i32)."""
    for k in range(7):
        s = 1 << k
        bit = jnp.int32(s)
        do = (rot & bit) != 0                      # [R,1] bool
        vals = [jnp.where(do, pltpu.roll(v, s, 1), v) for v in vals]
    return vals


def _v4_kernel(bases_ref, mask_ref, *refs, nwords: int, tiles: int, rows: int):
    """refs: nwords word tiles [R,L] i32; out [W, out_rows, L] (ANY);
    scratch: acc [W, 2R, L], stage [2, W, R, L] (double-buffered), sems[2].

    Flush DMAs are double-buffered: slot f stages into buffer f%2 and
    its DMA is only waited at slot f+2 (or kernel end), so the copy out
    of buffer (f-1)%2 overlaps the next ~TILE/count tiles of compute."""
    R = rows
    ins = refs[:nwords]
    out = refs[nwords]
    acc = refs[nwords + 1]
    stage = refs[nwords + 2]
    sems = refs[nwords + 3]
    TILE = R * L

    t = pl.program_id(0)
    base = bases_ref[t]
    nxt = bases_ref[t + 1]
    rem = base % TILE
    slot = base // TILE
    flush = (nxt // TILE) > slot

    def _dma(s):
        """The flush-copy descriptor for slot s (also used to wait)."""
        b = s % 2
        abase = pl.multiple_of(s * R, R)
        return pltpu.make_async_copy(
            stage.at[b], out.at[:, pl.ds(abase, R), :], sems.at[b])

    m = mask_ref[:]                                    # [R,L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)              # [L,L]
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [R,L] sums <=128
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [R,1]
    rRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (cRi < rRi).astype(jnp.float32)             # strict lower tri
    excl_row = jnp.dot(triR, cnt_col.astype(jnp.float32),
                       **HP).astype(jnp.int32)         # [R,1] sums <= R*128

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    sel = m                                            # i32 0/1 plane
    dist = jnp.where(sel != 0, lane + 1 - incl, 0)     # left deficit

    packed = _butterfly_pack([r_[:] for r_ in ins], sel, dist)

    S = rem + excl_row                                 # [R,1] output starts
    rot = S % L
    rolled = _rotate_rows(packed, rot)

    # MXU merge: row r's run lands in accumulator rows q=S//L (lanes
    # rot..rot+cnt) and q+1 (wrap). Rather than looping rows with
    # value-space selects (v3), scatter all rows at once with one-hot
    # matmuls. Exactness: i32 values split into 16-bit planes; every
    # (acc row, lane) receives at most ONE contribution (runs tile the
    # output contiguously), so f32-HIGHEST dots are exact (<2^24).
    row2R = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 0)
    q = S // L                                         # [R,1]
    iota_acc = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)
    ohT = (iota_acc == q).astype(jnp.float32)          # [R,2R] row->accrow
    ohT1 = (iota_acc == q + 1).astype(jnp.float32)
    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)  # wrapped part
    dnT = (((0,), (0,)), ((), ()))                     # contract sublanes
    # stack the direct (A) and wrapped (B) contributions along the
    # contracted dim: one dot covers both. 8-bit value planes keep
    # single-pass (bf16-operand) MXU dots exact: one-hot entries and
    # plane values <=255 are exact in bf16; accumulation is f32.
    oh2 = jnp.concatenate([ohT, ohT1], axis=0)         # [2R, 2Rout]
    m2f = jnp.concatenate([mA, mB], axis=0).astype(jnp.float32)
    union = jax.lax.dot_general(oh2, m2f, dnT, **DP)   # [2R, L]
    covered = union > 0.5                              # [2R,L] bool

    # slot-2's DMA read from the buffer this flush will restage into:
    # drain it BEFORE any stage write below
    @pl.when(flush & (slot >= 2))
    def _():
        _dma(slot - 2).wait()

    for wi in range(nwords):
        a = acc.at[wi]

        @pl.when(t == 0)
        def _(a=a):
            a[:] = jnp.zeros((2 * R, L), jnp.int32)

        v = rolled[wi]
        v2 = jnp.concatenate([v * mA, v * mB], axis=0)  # [2R, L]
        parts = []
        for shift in (0, 8, 16, 24):
            pf = ((v2 >> shift) & 0xFF).astype(jnp.float32)
            p = jax.lax.dot_general(oh2, pf, dnT, **DP)
            parts.append(p.astype(jnp.int32))
        contrib = (parts[0] | (parts[1] << 8) |
                   (parts[2] << 16) | (parts[3] << 24))  # [2R,L]
        carry = jnp.where(row2R < R, a[:], 0)          # clear spill half
        a[:] = jnp.where(covered, contrib, carry)

        @pl.when(flush)
        def _(a=a, wi=wi):
            stage[slot % 2, wi] = a[pl.ds(0, R), :]
            # spill half becomes the next carry (static sublane roll)
            a[:] = jnp.where(row2R < R, pltpu.roll(a[:], R, 0), 0)

    @pl.when(flush)
    def _():
        _dma(slot).start()

    @pl.when(t == tiles - 1)
    def _():
        S = nxt // TILE  # number of full slots already flushed

        @pl.when(S >= 2)
        def _():
            _dma(S - 2).wait()

        for wi in range(nwords):
            stage[S % 2, wi] = acc[wi, pl.ds(0, R), :]
        _dma(S).start()
        _dma(S).wait()

        @pl.when(S >= 1)
        def _():
            _dma(S - 1).wait()


def _to_words(c):
    """Split a fixed-width column into 32-bit word streams (see
    compaction_v3._to_words — identical contract).

    64-bit splits are ARITHMETIC (mask/shift + wrapping astype), not
    bitcast+minor-dim slices: under x64 emulation an i64 array is
    stored as hi/lo planes, and the i32[n, 2] bitcast intermediate is
    a relayout through a 2-lane minor dim that TPU pads to 128 (the
    bench_v13 65 ms anomaly, benchmarks/r4/probe_v14.py). Mask/shift
    read the planes directly."""
    dt_ = c.dtype
    if dt_ in (jnp.int64, jnp.uint64):
        w = c.astype(jnp.int64)
        lo = (w & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)  # wraps: lo bits
        hi = (w >> jnp.int64(32)).astype(jnp.int32)
        return [lo, hi], ("64", dt_)
    if dt_ == jnp.float64:
        raise TypeError("float64 device arrays cannot be bit-viewed on "
                        "device; pass int64 bit views (TOOLCHAIN_NOTES.md)")
    if dt_ == jnp.float32:
        return [jax.lax.bitcast_convert_type(c, jnp.int32)], ("f32", dt_)
    if dt_ == jnp.bool_:
        return [c.astype(jnp.int32)], ("bool", dt_)
    return [c.astype(jnp.int32)], ("int", dt_)


def _prep_words(cols, planes_meta):
    """Input word streams for a compaction kernel.

    planes_meta=None: cols are logical columns; split them via
    _to_words (one extra HBM read+write pass per column — the i64
    case materializes lo/hi planes).
    planes_meta=((n_words, (kind, dtype)), ...): cols are ALREADY the
    flat tuple of i32 word planes (the engine's plane-native storage
    for 64-bit columns, produced once at ingest) — the kernel reads
    them directly and the split pass disappears from the hot loop."""
    if planes_meta is None:
        words, col_meta = [], []
        for c in cols:
            ws, meta = _to_words(c)
            col_meta.append((len(ws), meta))
            words.extend(w.reshape(-1, L) for w in ws)
        return words, col_meta
    assert len(cols) == sum(nw for nw, _ in planes_meta), (
        len(cols), planes_meta)
    return [c.reshape(-1, L) for c in cols], list(planes_meta)


def _from_words(word_outs, kind_dt):
    kind, dt_ = kind_dt
    if kind == "64":
        lo = word_outs[0].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        v = (word_outs[1].astype(jnp.int64) << jnp.int64(32)) | lo
        return v if dt_ == jnp.int64 else v.astype(dt_)
    if kind == "f32":
        return jax.lax.bitcast_convert_type(word_outs[0], jnp.float32)
    if kind == "bool":
        return word_outs[0] != 0
    return word_outs[0].astype(dt_)


TILE_V4 = 1024  # default R=8; see compact_v4's rows argument


def best_rows(n: int) -> int:
    """Measured sweet spots (benchmarks/r2/results_tpu_r2.json: 10M rows
    R=64 1.36 G rows/s > R=128 1.30 > R=32 0.94; time_compaction_big:
    R=128 wins at >=32M): R=64 mid-size, R=128 huge, R=8 small so the
    [R,128] tile stays close to the data size."""
    if n >= (32 << 20):
        return 128
    if n >= (4 << 20):
        return 64
    if n >= (1 << 20):
        return 32
    return 8


def compact(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
            interpret: bool = False, variant: Optional[str] = None):
    """Size-dispatched compaction: butterfly kernel at the measured-best
    tile height. Pads mask/cols to the tile multiple (pad rows are
    unselected, so the compacted prefix is unaffected).

    A1T_COMPACT_KERNEL=v4|v7[:T]|v12[:R[:band]]|v13[:R[:band]]|
    v14[:R[:band]] selects the variant (round-4 consolidation: v14
    champion at large n, v7 at mid sizes, v4 robust fallback; the
    deleted v3/v5/v6/v8..v11 experiments live in git history and
    their A/B record in BENCH_NOTES.md). v13 requires all-64-bit
    columns and falls back to v7:8 otherwise."""
    import os

    if variant is None:
        # measured champions (BENCH_NOTES, 2026-08-20): v14:256 wins
        # at flagship scale (3.67 ms vs v7's 4.34 at 10M) but its
        # R*L=32K tile over-pads small batches — size-dispatch.
        variant = os.environ.get("A1T_COMPACT_KERNEL", None)
        if variant is None:
            variant = "v14:256" if mask.shape[0] >= (4 << 20) else "v7:8"
    n = mask.shape[0]
    R = best_rows(n)
    T = 1
    if variant.startswith("v13"):
        # v13 (interleaved-plane layout) measured DEAD on this
        # toolchain (76.6 ms — relayout; r4 probe_v13) and was deleted
        # in the r5 consolidation; v14 carries its proven ideas
        variant = "v14:256"
    if variant.startswith(("v12", "v14")):
        parts = variant.split(":")
        R = int(parts[1]) if len(parts) > 1 else 256
        band = int(parts[2]) if len(parts) > 2 else 0
        TILE = R * L
        pad = (-n) % TILE
        if pad:
            mask = jnp.concatenate([mask, jnp.zeros(pad, mask.dtype)])
            cols = tuple(jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
                         for c in cols)
        if variant.startswith("v14"):
            from .compaction_v14 import compact_v14

            # int8 routing dot: 2x bf16 on the v5e MXU, probed exact on
            # real TPU (benchmarks/r5 r5_int8_kernel; interpret-mode
            # exactness in test_compact_v5)
            return compact_v14(mask, cols, interpret=interpret, rows=R,
                               band=band, dot="i8")
        from .compaction_v12 import compact_v12

        return compact_v12(mask, cols, interpret=interpret, rows=R,
                           band=band)
    if variant.startswith("v7"):
        # measured-best defaults (BENCH_NOTES A/B: v7t8 at R=64)
        T = int(variant.split(":", 1)[1]) if ":" in variant else 8
        if R >= 128:
            # v7's batched intermediates scale with T*R; T=8 at R=128
            # exceeds the 110 MB VMEM budget (ADVICE r2) — cap T
            T = min(T, 4)
    TILE = R * L * T
    pad = (-n) % TILE
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros(pad, mask.dtype)])
        cols = tuple(jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
                     for c in cols)
    if variant.startswith("v7"):
        from .compaction_v7 import compact_v7

        return compact_v7(mask, cols, interpret=interpret, rows=R,
                          t_tiles=T)
    return compact_v4(mask, cols, interpret=interpret, rows=R)


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows", "out_limit",
                              "planes_meta"))
def compact_v4(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 8,
               out_limit: Optional[int] = None, planes_meta=None):
    """Compact fixed-width columns by mask (butterfly path).

    mask: bool[n], n % (rows*128) == 0; cols as in compact_v3.
    Returns (compacted cols padded to n + rows*128, count).

    out_limit: static upper bound on the survivor count (caller
    promises count <= out_limit). The returned columns are truncated
    to this many rows, so the plane recombine and every downstream
    consumer read only the live prefix instead of the full padded
    length — at selectivity s that cuts the post-kernel HBM traffic
    from O(n) to O(s*n). The reference filter sizes its output
    exactly (vector_selection.cc two-pass count-then-copy); a static
    bound is the jit-compatible analogue."""
    R = rows
    TILE = R * L
    n = mask.shape[0]
    assert n % TILE == 0, (n, TILE)
    tiles = n // TILE
    m32 = mask.astype(jnp.int32)

    counts = jnp.sum(m32.reshape(tiles, TILE), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1]

    words, col_meta = _prep_words(cols, planes_meta)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v4_kernel, nwords=nwords, tiles=tiles,
                               rows=R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + nwords),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nwords, 2 * R, L), jnp.int32),
            pltpu.VMEM((2, nwords, R, L), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    with jax.enable_x64(False):
        out3d = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nwords, out_rows, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bases, m2, *words)

    back = []
    pos = 0
    for nw, meta in col_meta:
        outs_i = [out3d[pos + j].reshape(-1)[:out_limit]
                  for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count
