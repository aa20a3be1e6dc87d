"""Butterfly stream compaction — v8: prefix hoisted out of the kernel.

v6's stage ablation priced the in-kernel prefix (within-row inclusive
scan dot + per-tile [H, H] exclusive row-count dot + iota/aux builds) at
~0.95 ms of the 10M-row flagship, all recomputed per grid step. v8 moves
it into plain XLA, where one fused pass over the mask produces:

  aux  [rows, L]  dist | sel<<7 — the butterfly routing plane
                  (identical bits to what v6/v7 derived in-kernel)
  meta [rows, L]  cnt | (rowbase mod 2^16) << 8, broadcast per row:
                  cnt = survivors in the row (<= 128, 8 bits);
                  rowbase = global output position of the row's first
                  survivor. 16 low bits suffice: the kernel needs
                  S_all = rowbase - TILE*slot(base_j), which lives in
                  [0, 2*TILE) and 2*TILE <= 2^16 for R <= 256, so the
                  subtraction is exact mod 2^16.

The kernel keeps v7's stacked butterfly, batched bf16 merge dot and
word-batched acc ring, but no longer runs any MXU/iota work to derive
positions — each step reads them. This also unlocks R=128 (the [H, H]
prefix dot made tall tiles quadratic; hoisted, taller tiles halve the
sequential acc-ring iteration count: tiles = n / (R * L)).

Reference semantics unchanged: filter with drop-null emit order
(cpp/src/arrow/compute/kernels/vector_selection.cc:570-830); exactness
property-tested against the eager oracle in interpret mode and via the
shared harness in tests/test_compact_v5.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction_v4 import _from_words, _to_words
from .compaction_v6 import _pack_rotate_stacked, _SEL

__all__ = ["compact_v8"]

L = 128

DP = dict(preferred_element_type=jnp.float32)
_DNB = (((1,), (1,)), ((0,), (0,)))  # batched: contract source-row dims


def _v8_kernel(bases_ref, aux_ref, meta_ref, *refs, nwords: int,
               steps: int, rows: int, t_tiles: int):
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

    # ---- read the hoisted prefix ------------------------------------
    aux = aux_ref[:]                                   # [H, L]
    meta_col = meta_ref[:, :1]                         # [H, 1]
    cnt_col = meta_col & 0xFF
    rb16 = (meta_col >> 8) & 0xFFFF

    base_j = [bases_ref[step * T + j] for j in range(T)]
    nxt_j = [bases_ref[step * T + j + 1] for j in range(T)]
    slot_base = jnp.concatenate(
        [jnp.broadcast_to(((b // TILE) * TILE).reshape(1, 1),
                          (R, 1)).astype(jnp.int32) for b in base_j],
        axis=0)
    S_all = (rb16 - (slot_base & 0xFFFF)) & 0xFFFF     # [H, 1]
    rot = S_all % L
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)

    # ---- stacked butterfly (pack + per-row rotate) --------------------
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*H, L]
    stk = _pack_rotate_stacked(stk, aux, rot, W)

    # ---- batched merge (v7) -------------------------------------------
    q = S_all // L                                     # [H, 1]
    iota2R = jax.lax.broadcasted_iota(jnp.int32, (H, 2 * R), 1)
    ohT = (iota2R == q).astype(jnp.bfloat16)           # [H, 2R]
    ohT1 = (iota2R == q + 1).astype(jnp.bfloat16)
    oh2t = jnp.concatenate([ohT.reshape(T, R, 2 * R),
                            ohT1.reshape(T, R, 2 * R)], axis=1)

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

    # ---- sequential acc ring (batched across words, v7) ---------------
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
                   static_argnames=("interpret", "rows", "t_tiles"))
def compact_v8(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 128,
               t_tiles: int = 8):
    """Drop-in replacement for compact_v4..v7 (same contract)."""
    R = rows
    T = t_tiles
    assert R <= 256, "rb16 wraps past 2*TILE = 2^16 (see module doc)"
    TILE = R * L
    n = mask.shape[0]
    assert n % (T * TILE) == 0, (n, T * TILE)
    tiles = n // TILE
    steps = tiles // T
    m32 = mask.astype(jnp.int32)

    # ---- hoisted prefix: one fused XLA pass over the mask -------------
    m2 = m32.reshape(-1, L)                            # [rows_n, L]
    incl = jnp.cumsum(m2, axis=1, dtype=jnp.int32)
    cnt = incl[:, -1]                                  # [rows_n]
    rowbase = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)])
    count = rowbase[-1]
    lane1 = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    dist = jnp.where(m2 != 0, lane1 - incl, 0)
    aux = dist | (m2 * _SEL)
    meta = (cnt | ((rowbase[:-1] & 0xFFFF) << 8))[:, None]
    meta = jnp.broadcast_to(meta, m2.shape)

    # per-TILE bases for the acc ring's slot/flush logic
    counts = jnp.sum(m2.reshape(tiles, R, L), axis=(1, 2),
                     dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])

    words = []
    col_meta = []
    for c in cols:
        ws, wmeta = _to_words(c)
        col_meta.append((len(ws), wmeta))
        words.extend(w.reshape(-1, L) for w in ws)
    nwords = len(words)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v8_kernel, nwords=nwords, steps=steps,
                               rows=R, t_tiles=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((T * R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * (2 + nwords),
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
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(bases, aux, meta, *words)

    back = []
    pos = 0
    for nw, wmeta in col_meta:
        outs_i = [out3d[pos + j].reshape(-1) for j in range(nw)]
        back.append(_from_words(outs_i, wmeta))
        pos += nw
    return tuple(back), count
