"""Butterfly stream compaction — v7: fully batched merge + acc.

v6 showed the stacked butterfly amortizes across tiles, but its merge
ran per (tile, word): ~50 small VPU/MXU ops per tile, op-issue bound
(~4 ms of the 7.9 ms flagship). v7 keeps v6's stacked butterfly and
replaces the merge with per-STEP batched ops:

- lane masks (mA/mB), one-hot row routers (oh2), and byte planes are
  built once per step over all T tiles / W words;
- the row-routing merge is ONE bf16 batched `dot_general` with batch
  dim (word, tile): lhs [W*T, 2R, 2R] one-hot, rhs [W*T, 2R, 4L] byte
  planes. One-hots are 0/1 and byte planes are integers <= 255 — both
  exact in bf16, and each output cell receives exactly one nonzero
  contribution (the routing is a bijection), so the f32 accumulation
  is exact;
- the cross-tile accumulator ring stays sequential (it carries the
  partially-filled output block) but each per-tile update is one
  [W, 2R, L] select instead of per-word selects, and the flush stages
  all words in one copy.

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

__all__ = ["compact_v7"]

L = 128


DP = dict(preferred_element_type=jnp.float32)
_DNB = (((1,), (1,)), ((0,), (0,)))  # batched: contract source-row dims


def _v7_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
               rows: int, t_tiles: int):
    R = rows
    T = t_tiles
    W = nwords
    H = T * R
    ins = refs[:W]
    out = refs[W]
    acc = refs[W + 1]          # [W, 2R, L]
    stage = refs[W + 2]        # [2, W, R, L]
    sems = refs[W + 3]
    TILE = R * L

    step = pl.program_id(0)

    def _dma(s):
        b = s % 2
        abase = pl.multiple_of(s * R, R)
        return pltpu.make_async_copy(
            stage.at[b], out.at[:, pl.ds(abase, R), :], sems.at[b])

    # ---- batched prefix over all T tiles -------------------------------
    m = mask_ref[:]                                    # [H, L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [H, L]
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [H, 1]
    rHi = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    cHi = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    triB = ((cHi < rHi) & (cHi // R == rHi // R)).astype(jnp.float32)
    excl_row = jnp.dot(triB, cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)             # [H, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    base_j = [bases_ref[step * T + j] for j in range(T)]
    nxt_j = [bases_ref[step * T + j + 1] for j in range(T)]
    rem_rows = jnp.concatenate(
        [jnp.broadcast_to((b % TILE).reshape(1, 1), (R, 1)).astype(
            jnp.int32) for b in base_j], axis=0)
    S_all = rem_rows + excl_row                        # [H, 1]
    rot = S_all % L

    # ---- stacked butterfly -----------------------------------------------
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*H, L]
    # NOTE: folding the rotation into the pack butterfly (route directly
    # to (incl-1+rot) mod L in 7 rounds) is NOT conflict-free: wrapped
    # elements cross non-wrapping residents and overwrite them (caught by
    # the density property test at d=0.13). Keep pack-then-rotate.
    stk = _pack_rotate_stacked(stk, aux, rot, W)

    # ---- batched merge -------------------------------------------------
    q = S_all // L                                     # [H, 1]
    iota2R = jax.lax.broadcasted_iota(jnp.int32, (H, 2 * R), 1)
    ohT = (iota2R == q).astype(jnp.bfloat16)           # [H, 2R]
    ohT1 = (iota2R == q + 1).astype(jnp.bfloat16)
    oh2t = jnp.concatenate([ohT.reshape(T, R, 2 * R),
                            ohT1.reshape(T, R, 2 * R)], axis=1)  # [T,2R,2R]

    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)  # [H, L]
    m2t = jnp.concatenate([mA.reshape(T, R, L),
                           mB.reshape(T, R, L)],
                          axis=1).astype(jnp.bfloat16)  # [T, 2R, L]
    union = jax.lax.dot_general(oh2t, m2t, _DNB, **DP)  # [T, 2R, L]
    covered = union > 0.5

    mAs = jnp.concatenate([mA] * W, axis=0)            # [W*H, L]
    mBs = jnp.concatenate([mB] * W, axis=0)
    vA = (stk * mAs).reshape(W * T, R, L)
    vB = (stk * mBs).reshape(W * T, R, L)
    v2 = jnp.concatenate([vA, vB], axis=1)             # [W*T, 2R, L]
    planes = jnp.concatenate(
        [((v2 >> shift) & 0xFF).astype(jnp.bfloat16)
         for shift in (0, 8, 16, 24)], axis=2)         # [W*T, 2R, 4L]
    oh2b = jnp.concatenate([oh2t] * W, axis=0)         # [W*T, 2R, 2R]
    p4 = jax.lax.dot_general(oh2b, planes, _DNB, **DP)  # [W*T, 2R, 4L]
    contrib = (p4[:, :, 0 * L:1 * L].astype(jnp.int32)
               | (p4[:, :, 1 * L:2 * L].astype(jnp.int32) << 8)
               | (p4[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
               | (p4[:, :, 3 * L:4 * L].astype(jnp.int32) << 24)
               ).reshape(W, T, 2 * R, L)

    # ---- sequential acc ring (batched across words) --------------------
    row2R = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * R, L), 1)

    @pl.when(step == 0)
    def _():
        acc[:] = jnp.zeros((W, 2 * R, L), jnp.int32)

    for j in range(T):
        slot = base_j[j] // TILE
        flush = (nxt_j[j] // TILE) > slot

        @pl.when(flush & (slot >= 2))
        def _():
            _dma(slot - 2).wait()

        cov_j = covered[j][None]                       # [1, 2R, L]
        carry = jnp.where(row2R < R, acc[:], 0)
        acc[:] = jnp.where(cov_j, contrib[:, j], carry)

        @pl.when(flush)
        def _(slot=slot):
            stage[slot % 2] = acc[:, pl.ds(0, R), :]
            acc[:] = jnp.where(row2R < R, pltpu.roll(acc[:], R, 1), 0)
            _dma(slot).start()

    @pl.when(step == steps - 1)
    def _():
        Sfin = nxt_j[T - 1] // TILE

        @pl.when(Sfin >= 2)
        def _():
            _dma(Sfin - 2).wait()

        stage[Sfin % 2] = acc[:, pl.ds(0, R), :]
        _dma(Sfin).start()
        _dma(Sfin).wait()

        @pl.when(Sfin >= 1)
        def _():
            _dma(Sfin - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows", "t_tiles",
                                    "out_limit", "planes_meta"))
def compact_v7(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 8, t_tiles: int = 4,
               out_limit=None, planes_meta=None):
    """Drop-in replacement for compact_v4/v5/v6 (same contract).

    out_limit: static survivor-count bound; truncates the returned
    columns so post-kernel recombine/consumer traffic is O(s*n)
    (see compact_v4's docstring)."""
    R = rows
    T = t_tiles
    TILE = R * L
    n = mask.shape[0]
    assert n % (T * TILE) == 0, (n, T * TILE)
    tiles = n // TILE
    steps = tiles // T
    m32 = mask.astype(jnp.int32)

    counts = jnp.sum(m32.reshape(tiles, TILE), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1]

    words, col_meta = _prep_words(cols, planes_meta)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v7_kernel, nwords=nwords, steps=steps,
                               rows=R, t_tiles=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((T * R, L), lambda i, b: (i, 0),
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
            out_shape=jax.ShapeDtypeStruct((nwords, out_rows, L),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
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
