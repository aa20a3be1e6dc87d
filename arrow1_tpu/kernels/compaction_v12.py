"""Stream compaction v12: banded one-hot routing + overlapping DMA.

The round-3 post-mortem (compaction_v11.py:4-8) priced every butterfly
variant at full-stack TRAVERSAL count: v7..v11 all route packed rows to
output rows with O(log H) extra passes over the [W*H, L] data stack (or
with v7's accumulator ring whose per-tile whole-accumulator selects cost
the same), and all plateau at 7.1-8.9 ms for the 10M-row flagship. v12
reduces the data-plane work after the (unavoidable) per-row pack+rotate
to a CONSTANT number of touches:

  1. pack+rotate (compaction_v6 butterfly, unchanged): row r's survivors
     end up lane-aligned at [S_r % L, S_r % L + cnt_r) of its own plane,
     where S_r is the row's global output offset.
  2. banded one-hot routing: output row q receives the A-parts (no lane
     wrap) of the consecutive source-row run {r : q_r == q} and the
     B-part (lane wrap) of the previous run's last row. Because a run's
     A-parts are lane-disjoint and at most one row per run wraps, both
     are SELECTIONS, so one bf16 byte-plane one-hot matmul per side is
     exact: X = OH^T @ planes with OH[r, q'] = (q_rel_r == q'). The
     one-hot is BANDED — q_rel in [0, band) with band chosen from the
     prefix counts (lax.cond over two precompiled band buckets), so the
     MXU cost tracks the OUTPUT size, not the worst case.
  3. boundary select: out[q] = (lane < boundary_q) ? XB[q-1] : XA[q],
     one roll + one select in plane space; boundary_q = S % L of the
     run's first row, recovered with a tiny one-hot matvec.
  4. overlapping DMA: each step DMAs its [W, band, L] window to the
     output at dynamic row offset base//L. Consecutive windows share
     exactly one row (the partial boundary row), which rides a VMEM
     carry and is REWRITTEN complete by the next step; rows past the
     step's content are zeros that later steps overwrite. DMAs are
     serialized (wait step s-1 before starting s) so overlapping writes
     land in step order. No accumulator ring, no per-tile loops.

Reference semantics unchanged: filter with drop-null emit order
(cpp/src/arrow/compute/kernels/vector_selection.cc:570-830); exactness
property-tested against the eager oracle in interpret mode and on TPU
via the shared harness in tests/test_compact_v5.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction_v4 import _from_words, _prep_words
from .butterfly import _SEL, _pack_rotate_stacked

__all__ = ["compact_v12"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))   # [W,R,RP] x [W,R,4L] -> [W,RP,4L]
_DN_BND = (((0,), (0,)), ((), ()))         # [R,RP] x [R,1] -> [RP,1]


def _v12_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
                rows: int, band: int):
    R = rows
    W = nwords
    RP = band                  # output-window rows per step (incl. margin)
    ins = refs[:W]
    out = refs[W]
    stage = refs[W + 1]        # [2, W, RP, L] i32
    carry = refs[W + 2]        # [W, 8, L] i32 (row 0 = partial boundary row)
    sems = refs[W + 3]

    step = pl.program_id(0)
    base = bases_ref[step]
    base_n = bases_ref[step + 1]
    q0 = base // L

    @pl.when(step == 0)
    def _():
        carry[:] = jnp.zeros((W, 8, L), jnp.int32)

    # ---- per-row prefix (mask plane only) ------------------------------
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

    # output offsets relative to the step's window origin q0*L: the
    # base%L origin keeps q_rel in [0, R] and rot unchanged mod L
    S_all = excl_row + base % L                        # [R, 1]
    rot = S_all % L
    q_rel = S_all // L                                 # [R, 1] in [0, R]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    # ---- pack + rotate (the one mandatory data movement) ---------------
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*R, L]
    stk = _pack_rotate_stacked(stk, aux, rot, W)

    # ---- byte planes, split into A (no wrap) / B (wrap) ----------------
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

    # ---- banded one-hot routing ----------------------------------------
    qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
    oh_b = qi == q_rel                                 # [R, RP] bool
    OH = oh_b.astype(jnp.bfloat16)
    OH3 = jnp.concatenate([OH[None]] * W, axis=0)      # [W, R, RP]
    XA = jax.lax.dot_general(OH3, pa, _DN_ROUTE, **DP)  # [W, RP, 4L]
    XB = jax.lax.dot_general(OH3, pb, _DN_ROUTE, **DP)

    # boundary lane per output row: rot of the run's first source row
    rio1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    q_prev = pltpu.roll(q_rel, 1, 0)
    first = (rio1 == 0) | (q_rel != q_prev)            # [R, 1]
    OHf = (oh_b & first).astype(jnp.float32)
    bnd = jax.lax.dot_general(OHf, rot.astype(jnp.float32),
                              _DN_BND, **DP).astype(jnp.int32)   # [RP, 1]
    # output rows with NO run of their own (the step's final partial row
    # when the last source row's band merely wraps into it) take their
    # whole content from the previous run's wrap: boundary = L
    hasf = jax.lax.dot_general(OHf, jnp.ones((R, 1), jnp.float32),
                               _DN_BND, **DP).astype(jnp.int32)  # [RP, 1]
    bnd = jnp.where(hasf > 0, bnd, L)

    # ---- stitch: low lanes from previous run's wrap --------------------
    XBp = pltpu.roll(XB, 1, 1)                         # row q <- XB[q-1]
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (RP, 4 * L), 1) % L
    low = lane4 < bnd                                  # [RP, 4L]
    Xs = jnp.where(low[None], XBp, XA)                 # [W, RP, 4L]
    out_i = (Xs[:, :, 0 * L:1 * L].astype(jnp.int32)
             | (Xs[:, :, 1 * L:2 * L].astype(jnp.int32) << 8)
             | (Xs[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
             | (Xs[:, :, 3 * L:4 * L].astype(jnp.int32) << 24))

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


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows", "band", "out_limit",
                              "planes_meta"))
def compact_v12(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
                interpret: bool = False, rows: int = 256,
                band: int = 0, out_limit=None, planes_meta=None):
    """Drop-in replacement for compact_v4..v11 (same contract).

    out_limit: static survivor-count bound; truncates the returned
    columns so post-kernel recombine/consumer traffic is O(s*n)
    (see compact_v4's docstring).

    band=0 selects between two precompiled band buckets with lax.cond
    based on the actual per-step output-row maximum (safe everywhere);
    band=-1 forces the full window; band>0 forces that window (the
    kernel is only exact if every step's output fits, which the
    bucket auto-pick guarantees).
    """
    R = rows
    n = mask.shape[0]
    assert n % (R * L) == 0, (n, R * L)
    steps = n // (R * L)
    m32 = mask.astype(jnp.int32)

    counts = jnp.sum(m32.reshape(steps, R * L), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1]

    words, col_meta = _prep_words(cols, planes_meta)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    full_band = R + 9
    half_band = min(R // 2 + 24, full_band)
    out_rows = n // L + full_band  # >= any bucket's window overhang

    def _call(rp):
        kernel = functools.partial(_v12_kernel, nwords=nwords,
                                   steps=steps, rows=R, band=rp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM)
                      ] * (1 + nwords),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, nwords, rp, L), jnp.int32),
                pltpu.VMEM((nwords, 8, L), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nwords, out_rows, L),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )

    with jax.enable_x64(False):
        if band > 0:
            out3d = _call(min(band, full_band))(bases, m2, *words)
        elif band == -1 or half_band == full_band:
            out3d = _call(full_band)(bases, m2, *words)
        else:
            # max output rows any step produces (+1 for the partial row)
            qs = bases // L
            needed = jnp.max(qs[1:] - qs[:-1]) + 1
            out3d = jax.lax.cond(
                needed <= half_band,
                lambda a, m_, *w: _call(half_band)(a, m_, *w),
                lambda a, m_, *w: _call(full_band)(a, m_, *w),
                bases, m2, *words)

    back = []
    pos = 0
    for nw, meta in col_meta:
        outs_i = [out3d[pos + j].reshape(-1)[:out_limit]
                  for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count
