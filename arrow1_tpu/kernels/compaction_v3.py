"""Lane-gather MXU/VPU stream compaction — v3, the fast path.

v2 (compaction_split.py) proved the pipeline but spends its time building
[1024,1024] one-hot matrices (T ops/element). v3 eliminates them using the
two Mosaic primitives proven exact on this toolchain
(TOOLCHAIN_NOTES.md): `take_along_axis(axis=1)` (lane gather) and
lane-rolls via modular-index gathers.

Per 1024-row tile, viewed as [8,128] (row-major = tile-linear order):

  incl   = m @ triU                       # within-row prefix ([8,128]@[128,128])
  cnt_r  = incl[:,-1]; excl_row = tri8 @ cnt   # row offsets ([8,8] dot)
  idx[r,l] = #{j : incl[r,j] <= l}        # lane index of l-th selected
                                           # (8 x [128,128] compare + dot)
  comp   = take_along_axis(words, idx, 1) # per-row compaction (lane gather)
  merge  : row r's cnt_r lanes go to tile-linear offset rem+excl_row[r];
           realized as a modular lane-roll + two masked adds into a
           [16,128] accumulator (value-space, no dynamic writes)
  flush  : when the tile-linear total crosses 1024, DMA accumulator rows
           0..7 to the aligned output slot; rows 8..15 become the carry.

Per-tile output bases come from a pure-XLA mask reduction + cumsum (no
positions kernel needed). Everything traces under enable_x64(False).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_v3", "TILE"]

TILE = 1024
R, L = 8, 128

HP = dict(preferred_element_type=jnp.float32,
          precision=jax.lax.Precision.HIGHEST)


def _v3_kernel(bases_ref, mask_ref, *refs, nwords: int, tiles: int):
    """refs: nwords word tiles [8,128] i32, nwords HBM outs [rows,128],
    scratch: nwords accum [16,128], sems[nwords]."""
    ins = refs[:nwords]
    outs = refs[nwords:2 * nwords]
    accums = refs[2 * nwords:3 * nwords]
    sems = refs[3 * nwords]

    t = pl.program_id(0)
    base = bases_ref[t]
    nxt = bases_ref[t + 1]
    rem = base % TILE
    slot = base // TILE
    flush = (nxt // TILE) > slot

    m = mask_ref[:]                                   # [8,128] i32 0/1
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    # default (bf16) MXU precision is EXACT here: these dots sum <=128
    # ones, and bf16 represents integers up to 256 exactly — only the
    # [8,8] row-offset dot (sums up to 1024) needs HIGHEST
    DP = dict(preferred_element_type=jnp.float32)
    triU = (ci <= cj).astype(jnp.float32)             # [128,128]
    incl = jnp.dot(m.astype(jnp.float32), triU,
                   **DP).astype(jnp.int32)            # [8,128]
    ones_col = jnp.ones((L, 1), jnp.float32)
    # row counts via matmul (lane-slice extraction like incl[:, -1:]
    # is in the miscompiling strided-read class — TOOLCHAIN_NOTES.md)
    cnt_col = jnp.dot(m.astype(jnp.float32), ones_col,
                      **DP).astype(jnp.int32)         # [8,1]
    r8i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    c8i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    tri8 = (c8i < r8i).astype(jnp.float32)            # strict lower tri
    excl_row = jnp.dot(tri8, cnt_col.astype(jnp.float32),
                       **HP).astype(jnp.int32)        # [8,1]

    # lane indices of the l-th selected element per row:
    # idx[l] = #{j : incl[j] <= l} — built transpose-free:
    # C2[l, j] = (incl[j] <= l), idx = C2 @ ones
    idx_rows = []
    for r in range(R):
        incl_r = incl[r:r + 1, :]                     # [1,128] row slice
        incl_b = jnp.broadcast_to(incl_r, (L, L))     # [l, j] = incl[j]
        C2 = (incl_b <= ci).astype(jnp.float32)       # ci[l, j] = l
        idx_r = jnp.dot(C2, ones_col, **DP)[:, 0]     # [128] sums <=128
        idx_rows.append(jnp.clip(idx_r.astype(jnp.int32), 0, L - 1)[None, :])
    idx = jnp.concatenate(idx_rows, axis=0)           # [8,128]

    row16 = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 1)

    # per-row roll shifts (start lane of each row's run), one batched
    # lane gather for all rows ([1,128] gathers trip a shape check;
    # [8,128] matches the proven probe shape)
    S_rows = [rem + excl_row[r, 0] for r in range(R)]
    sh_rows = [S % L for S in S_rows]
    gidx_rows = [((lane[0:1, :] - sh) % L) for sh in sh_rows]
    gidx = jnp.concatenate(gidx_rows, axis=0)         # [8,128]

    for wi in range(nwords):
        comp = jnp.take_along_axis(ins[wi][:], idx, axis=1)  # [8,128]
        rolled_all = jnp.take_along_axis(comp, gidx, axis=1)
        acc = accums[wi]
        # initialize: rows 0..7 = carry (previous content), rows 8..15 = 0
        @pl.when(t == 0)
        def _(acc=acc):
            acc[:] = jnp.zeros((2 * R, L), jnp.int32)

        new = acc[:]
        new = jnp.where(row16 < R, new, 0)            # clear spill half
        for r in range(R):
            sh = sh_rows[r]
            q = S_rows[r] // L
            cnt_r = cnt_col[r, 0]
            rolled_b = jnp.broadcast_to(rolled_all[r:r + 1, :], (2 * R, L))
            in_q = (row16 == q) & (lane16 >= sh) & (lane16 < sh + cnt_r)
            in_q1 = (row16 == q + 1) & (lane16 < sh + cnt_r - L)
            new = jnp.where(in_q | in_q1, rolled_b, new)
        acc[:] = new

        @pl.when(flush)
        def _(acc=acc, wi=wi):
            abase = pl.multiple_of(slot * R, R)
            pltpu.make_async_copy(acc.at[pl.ds(0, R), :],
                                  outs[wi].at[pl.ds(abase, R), :],
                                  sems.at[jnp.int32(wi)]).start()
            pltpu.make_async_copy(acc.at[pl.ds(0, R), :],
                                  outs[wi].at[pl.ds(abase, R), :],
                                  sems.at[jnp.int32(wi)]).wait()
            # move spill half down to become the next carry (static
            # sublane roll; take_along_axis(axis=0) miscompiles)
            spill = acc[:]
            acc[:] = jnp.where(row16 < R, pltpu.roll(spill, R, 0), 0)

        @pl.when(t == tiles - 1)
        def _(acc=acc, wi=wi):
            fbase = pl.multiple_of((nxt // TILE) * R, R)
            pltpu.make_async_copy(acc.at[pl.ds(0, R), :],
                                  outs[wi].at[pl.ds(fbase, R), :],
                                  sems.at[jnp.int32(wi)]).start()
            pltpu.make_async_copy(acc.at[pl.ds(0, R), :],
                                  outs[wi].at[pl.ds(fbase, R), :],
                                  sems.at[jnp.int32(wi)]).wait()


def _to_words(c):
    """Split a fixed-width column into 32-bit word streams (1 word for
    <=32-bit, 2 for 64-bit). Values round-trip bit-exactly; sub-32-bit
    types widen (zero/sign-extension is irrelevant — bits come back via
    truncation)."""
    dt_ = c.dtype
    if dt_ in (jnp.int64, jnp.uint64):
        pair = jax.lax.bitcast_convert_type(c.astype(jnp.int64), jnp.int32)
        return [pair[:, 0], pair[:, 1]], ("64", dt_)
    if dt_ == jnp.float64:
        raise TypeError("float64 device arrays cannot be bit-viewed on "
                        "device; pass int64 bit views (TOOLCHAIN_NOTES.md)")
    if dt_ == jnp.float32:
        return [jax.lax.bitcast_convert_type(c, jnp.int32)], ("f32", dt_)
    if dt_ == jnp.bool_:
        return [c.astype(jnp.int32)], ("bool", dt_)
    return [c.astype(jnp.int32)], ("int", dt_)


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_v3(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False):
    """Compact fixed-width columns by mask (lane-gather path).

    mask: bool[n], n % TILE == 0; cols: int8..64/uint/float32/bool arrays
    (f64 payloads as int64 bit views — device f64->bits is not lowerable).
    Returns (compacted cols padded to n+TILE, count)."""
    n = mask.shape[0]
    assert n % TILE == 0
    tiles = n // TILE
    m32 = mask.astype(jnp.int32)

    counts = jnp.sum(m32.reshape(tiles, TILE), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1]

    words = []
    col_meta = []
    for c in cols:
        ws, meta = _to_words(c)
        col_meta.append((len(ws), meta))
        words.extend(w.reshape(-1, L) for w in ws)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v3_kernel, nwords=nwords, tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + nwords),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nwords,
        scratch_shapes=[
            *[pltpu.VMEM((2 * R, L), jnp.int32) for _ in range(nwords)],
            pltpu.SemaphoreType.DMA((nwords,)),
        ],
    )
    with jax.enable_x64(False):
        word_outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((out_rows, L), jnp.int32)
                       for _ in range(nwords)],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bases, m2, *words)

    back = []
    pos = 0
    for nw, meta in col_meta:
        outs_i = [word_outs[pos + j].reshape(-1) for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count
