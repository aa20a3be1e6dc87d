"""Stream compaction v14: v12's word-plane layout + one-dot routing.

v13 proved two ideas and disproved one:
- PROVED (ported here): a source row's no-wrap part (A) targets output
  row q_rel and its wrapped part (B) targets q_rel + 1, and all
  contributions to one output row tile DISJOINT lanes — so routing
  both sides is ONE banded one-hot matmul over the stacked [A; B]
  byte planes, and addition IS the select. v12's bnd/hasf matvecs,
  XB roll, and per-lane boundary select disappear.
- PROVED: fused take-test / vacated-clear butterfly rounds
  (butterfly.py micro-opts).
- DISPROVED: "free" interleaved i64 views. Under x64 emulation an i64
  array is hi/lo PLANES; the i32[n,2] bitcast view is a relayout
  through a 2-lane minor dim padded to 128 lanes (bench_v13 measured
  65 ms/iter on the flagship). v14 therefore keeps v12's separate
  word-plane layout, with _to_words now splitting arithmetically
  (mask/shift — plane reads, no bitcast intermediate).

Same contract as compact_v4/v7/v12 (any fixed-width column mix).
Reference semantics: filter with drop-null emit order
(cpp/src/arrow/compute/kernels/vector_selection.cc:570-830); exactness
property-tested in interpret mode and on TPU via the shared harness.
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

__all__ = ["compact_v14"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))  # [W,2R,RP] x [W,2R,4L] -> [W,RP,4L]


def _v14_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
                rows: int, band: int, dot_i8: bool = False):
    R = rows
    W = nwords
    RP = band
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
    incl = jnp.dot(mf, (ci <= cj).astype(jnp.float32), **DP
                   ).astype(jnp.int32)                 # [R, L]
    cnt_col = jnp.dot(mf, jnp.ones((L, 1), jnp.float32), **DP
                      ).astype(jnp.int32)              # [R, 1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    excl_row = jnp.dot((rj < ri).astype(jnp.float32),
                       cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)             # [R, 1]

    S_all = excl_row + base % L
    rot = S_all % L
    q_rel = S_all // L                                 # [R, 1] in [0, R]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    # ---- pack + rotate (the one mandatory data movement) ---------------
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*R, L]
    stk = _pack_rotate_stacked(stk, aux, rot, W)

    # ---- byte planes, A (no wrap) / B (wrap) ---------------------------
    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)
    stk3 = stk.reshape(W, R, L)
    a3 = stk3 * mA[None]
    b3 = stk3 * mB[None]
    # byte planes: int8 when the MXU int8 path is requested (runs 2x
    # bf16 on v5e; measured 2.758 vs 2.956 ms flagship-shape, probed
    # EXACT on real TPU — benchmarks/r5/results_tpu_r5.json
    # r5_int8_kernel). Bytes 128..255 wrap to negative int8; the & 0xFF
    # at reassembly recovers them (each output lane receives exactly
    # one contribution — disjoint-lane addition).
    pdt = jnp.int8 if dot_i8 else jnp.bfloat16
    pa = jnp.concatenate(
        [((a3 >> sh) & 0xFF).astype(pdt)
         for sh in (0, 8, 16, 24)], axis=2)            # [W, R, 4L]
    pb = jnp.concatenate(
        [((b3 >> sh) & 0xFF).astype(pdt)
         for sh in (0, 8, 16, 24)], axis=2)
    pab = jnp.concatenate([pa, pb], axis=1)            # [W, 2R, 4L]

    # ---- one-dot banded routing: A -> q_rel, B -> q_rel + 1 ------------
    # all contributions to an output row tile disjoint lanes (global
    # survivor lanes are unique), so addition == the select
    qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
    ohA = (qi == q_rel).astype(pdt)
    ohB = (qi == q_rel + 1).astype(pdt)
    OH = jnp.concatenate([ohA, ohB], axis=0)           # [2R, RP]
    OH3 = jnp.concatenate([OH[None]] * W, axis=0)      # [W, 2R, RP]
    if dot_i8:
        X = jax.lax.dot_general(OH3, pab, _DN_ROUTE,
                                preferred_element_type=jnp.int32)
        out_i = ((X[:, :, 0 * L:1 * L] & 0xFF)
                 | ((X[:, :, 1 * L:2 * L] & 0xFF) << 8)
                 | ((X[:, :, 2 * L:3 * L] & 0xFF) << 16)
                 | (X[:, :, 3 * L:4 * L] << 24))
    else:
        X = jax.lax.dot_general(OH3, pab, _DN_ROUTE, **DP)  # [W,RP,4L]
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


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows", "band", "out_limit",
                              "planes_meta", "dot"))
def compact_v14(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
                interpret: bool = False, rows: int = 256,
                band: int = 0, out_limit=None, planes_meta=None,
                dot: str = "bf16"):
    """Drop-in replacement for compact_v4/v7/v12 (same contract).

    band as in compact_v12: 0 = two precompiled band buckets picked by
    lax.cond from the per-step output-row maximum; -1 = full window;
    >0 forces that window.

    out_limit: static survivor-count bound; truncates the returned
    columns so post-kernel recombine/consumer traffic is O(s*n)
    (see compact_v4's docstring).

    dot: "bf16" | "i8" — the routing-dot MXU dtype. int8 runs 2x bf16
    on v5e (r5 probe: 2.758 vs 2.956 ms flagship shape, exact); bf16
    is the portable default (interpret mode has no int8 MXU)."""
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
    out_rows = n // L + full_band

    def _call(rp):
        kernel = functools.partial(_v14_kernel, nwords=nwords,
                                   steps=steps, rows=R, band=rp,
                                   dot_i8=dot == "i8")
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
