"""Stream compaction v13: interleaved 64-bit planes + one-dot routing.

v12's TPU stage ablation (benchmarks/r4/v12_ablate.py) priced the
kernel at 3.73 ms for the 10M-row flagship — but the measured flagship
step was ~7.6 ms: the other half was HARNESS passes around the kernel
(`_to_words` lo/hi plane splits, `_from_words` recombines, padded
projection). v13 removes the word-plane conversion entirely and slims
the in-kernel routing:

1. INTERLEAVED PLANES: each 64-bit column rides as its free
   `bitcast_convert_type(i64 -> i32[n,2]).reshape(2n)` view — lanes
   (2k, 2k+1) hold element k's (lo, hi). No split/recombine passes:
   W = ncols planes of 2n lanes instead of 2*ncols planes of n.
   Compaction routing is identical at lane level with the mask
   DOUBLED per lane pair: each survivor contributes two adjacent
   lanes, so lane-rank = 2*element-rank and pairs stay adjacent and
   ordered. The inverse bitcast (i32[m,2] -> i64[m]) reconstructs
   outputs for free (arithmetic fallback behind A1T_V13_RECOMBINE).
2. EVEN-SHIFT BUTTERFLY: every pack deficit and output rotation is
   2x an element count, so bit 0 never fires — both butterfly phases
   skip their shift-by-1 round (12 stack passes instead of 14).
3. ONE-DOT ROUTING (replaces v12's A/B dots + roll + boundary
   select): a source row's no-wrap part (A) targets output row q_rel,
   its wrapped part (B) targets q_rel + 1, and all contributions to
   one output row tile DISJOINT lanes (survivor lanes are globally
   unique), so routing both sides is ONE banded one-hot matmul over
   the stacked [A; B] byte planes — addition IS the select. v12's
   bnd/hasf matvecs and the per-lane boundary select disappear.

Same contract as compact_v4/v7/v12 but restricted to 64-bit columns
(int64/uint64, f64 carried as int64 bit views per TOOLCHAIN_NOTES).
Reference semantics: filter with drop-null emit order
(cpp/src/arrow/compute/kernels/vector_selection.cc:570-830); exactness
property-tested in interpret mode and on TPU via the shared harness.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .butterfly import _SEL, _pack_rotate_stacked

__all__ = ["compact_v13"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))  # [W,2R,RP] x [W,2R,4L] -> [W,RP,4L]


def _v13_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
                rows: int, band: int):
    R = rows
    W = nwords
    RP = band
    ins = refs[:W]
    out = refs[W]
    stage = refs[W + 1]        # [2, W, RP, L] i32
    carry = refs[W + 2]        # [W, 8, L] i32 (row 0 = partial boundary row)
    sems = refs[W + 3]

    step = pl.program_id(0)
    base = bases_ref[step]          # lane units (always even)
    base_n = bases_ref[step + 1]
    q0 = base // L

    @pl.when(step == 0)
    def _():
        carry[:] = jnp.zeros((W, 8, L), jnp.int32)

    # ---- per-row prefix over the DOUBLED mask --------------------------
    m = mask_ref[:]                                    # [R, L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [R, L]
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [R, 1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (rj < ri).astype(jnp.float32)
    excl_row = jnp.dot(triR, cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)             # [R, 1]

    S_all = excl_row + base % L                        # [R, 1] (even)
    rot = S_all % L
    q_rel = S_all // L                                 # [R, 1] in [0, R]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)       # even by pairing
    aux = dist | (m * _SEL)

    # ---- pack + rotate (shift-by-1 rounds skipped: all shifts even) ----
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*R, L]
    stk = _pack_rotate_stacked(stk, aux, rot, W, start_round=1)

    # ---- byte planes, A (no wrap) / B (wrap) ---------------------------
    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)
    stk3 = stk.reshape(W, R, L)
    a3 = stk3 * mA[None]
    b3 = stk3 * mB[None]
    pa = jnp.concatenate(
        [((a3 >> sh) & 0xFF).astype(jnp.bfloat16)
         for sh in (0, 8, 16, 24)], axis=2)            # [W, R, 4L]
    pb = jnp.concatenate(
        [((b3 >> sh) & 0xFF).astype(jnp.bfloat16)
         for sh in (0, 8, 16, 24)], axis=2)
    pab = jnp.concatenate([pa, pb], axis=1)            # [W, 2R, 4L]

    # ---- one-dot banded routing: A -> q_rel, B -> q_rel + 1 ------------
    # all contributions to an output row tile disjoint lanes (global
    # survivor lanes are unique), so f32 addition == the select
    qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
    ohA = (qi == q_rel).astype(jnp.bfloat16)
    ohB = (qi == q_rel + 1).astype(jnp.bfloat16)
    OH = jnp.concatenate([ohA, ohB], axis=0)           # [2R, RP]
    OH3 = jnp.concatenate([OH[None]] * W, axis=0)      # [W, 2R, RP]
    X = jax.lax.dot_general(OH3, pab, _DN_ROUTE, **DP)  # [W, RP, 4L]
    out_i = (X[:, :, 0 * L:1 * L].astype(jnp.int32)
             | (X[:, :, 1 * L:2 * L].astype(jnp.int32) << 8)
             | (X[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
             | (X[:, :, 3 * L:4 * L].astype(jnp.int32) << 24))

    # row 0's low lanes come from the previous STEP's partial row
    rio = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 0)
    laneRP = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 1)
    bnd0 = base % L
    out_i = jnp.where((rio[None] == 0) & (laneRP[None] < bnd0),
                      carry[:, 0:1, :], out_i)

    # carry out the new partial boundary row (complete rows are final)
    r_last = base_n // L - q0
    carry[:, 0:1, :] = jnp.sum(
        out_i * (rio[None] == r_last), axis=1, keepdims=True)

    # ---- overlapping serialized DMA ------------------------------------
    slot = step % 2
    stage[slot] = out_i

    def _dma(s, q):
        return pltpu.make_async_copy(
            stage.at[s % 2], out.at[:, pl.ds(q, RP), :], sems.at[s % 2])

    @pl.when(step >= 1)
    def _():
        _dma(step - 1, bases_ref[step - 1] // L).wait()

    _dma(step, q0).start()

    @pl.when(step == steps - 1)
    def _():
        _dma(step, q0).wait()


def _interleave_plane(c: jnp.ndarray) -> jnp.ndarray:
    """i64/u64[n] -> i32[2n/L, L] lane view (free bitcast + reshape)."""
    pair = jax.lax.bitcast_convert_type(c, jnp.int32)   # [n, 2]
    return pair.reshape(-1, L)


def _recombine64(plane: jnp.ndarray, dt_) -> jnp.ndarray:
    """i32[rows, L] interleaved -> 64-bit column (padded)."""
    pairs = plane.reshape(-1, 2)
    if os.environ.get("A1T_V13_RECOMBINE", "bitcast") == "bitcast":
        v = jax.lax.bitcast_convert_type(pairs, jnp.int64)
    else:
        lo = pairs[:, 0].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        v = (pairs[:, 1].astype(jnp.int64) << jnp.int64(32)) | lo
    return v if dt_ == jnp.int64 else v.astype(dt_)


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows", "band", "out_limit"))
def compact_v13(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
                interpret: bool = False, rows: int = 256,
                band: int = 0, out_limit=None):
    """Compact 64-bit columns by mask (interleaved one-dot path).

    mask: bool[n], n % (rows*64) == 0; cols: int64/uint64 (f64 as
    int64 bit views). Returns (compacted cols padded past n, count).
    band as in compact_v12 (0 = bucket auto-pick, -1 = full window).
    out_limit: static survivor-count bound; truncates the returned
    columns so recombine/consumer traffic is O(s*n) (see
    compact_v4's docstring).
    """
    R = rows
    n = mask.shape[0]
    W = len(cols)
    assert n % (R * (L // 2)) == 0, (n, R * (L // 2))
    assert all(c.dtype in (jnp.int64, jnp.uint64) for c in cols), \
        [c.dtype for c in cols]
    n2 = 2 * n
    steps = n2 // (R * L)

    counts = jnp.sum(mask.reshape(steps, R * (L // 2)), axis=1,
                     dtype=jnp.int32) * 2               # lane units
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1] // 2                              # elements

    # doubled lane mask straight from the bool mask (no i32 intermediate)
    md = jnp.broadcast_to(mask[:, None], (n, 2)).reshape(-1, L) \
        .astype(jnp.int32)
    planes = [_interleave_plane(c) for c in cols]
    full_band = R + 9
    half_band = min(R // 2 + 24, full_band)
    out_rows = n2 // L + full_band

    def _call(rp):
        kernel = functools.partial(_v13_kernel, nwords=W, steps=steps,
                                   rows=R, band=rp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM)] * (1 + W),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, W, rp, L), jnp.int32),
                pltpu.VMEM((W, 8, L), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, out_rows, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )

    with jax.enable_x64(False):
        if band > 0:
            out3d = _call(min(band, full_band))(bases, md, *planes)
        elif band == -1 or half_band == full_band:
            out3d = _call(full_band)(bases, md, *planes)
        else:
            qs = bases // L
            needed = jnp.max(qs[1:] - qs[:-1]) + 1
            out3d = jax.lax.cond(
                needed <= half_band,
                lambda a, m_, *w: _call(half_band)(a, m_, *w),
                lambda a, m_, *w: _call(full_band)(a, m_, *w),
                bases, md, *planes)

    if out_limit is not None:
        # interleaved layout: 64 elements per [*, L] row — slice whole
        # rows before the recombine, then trim to the exact bound
        lim_rows = min((2 * out_limit + L - 1) // L + 1, out_rows)
        back = tuple(
            _recombine64(out3d[w][:lim_rows], cols[w].dtype)[:out_limit]
            for w in range(W))
    else:
        back = tuple(_recombine64(out3d[w], cols[w].dtype)
                     for w in range(W))
    return back, count
