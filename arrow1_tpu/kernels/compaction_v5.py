"""Butterfly stream compaction — v5: stacked-plane rolls.

Same algorithm as v4 (within-row pack butterfly + row rotation butterfly
+ one-hot MXU merge; see compaction_v4.py for the full design notes and
reference semantics: cpp/src/arrow/compute/kernels/vector_selection.cc:
570-830). v4's per-tile time is dominated by cross-lane rolls (measured
~80 ns per [64,128] roll vs ~3 ns sublane, benchmarks/r2 ablate_micro*),
and it issues one roll PER WORD PLANE per round: 7 rounds x (6 word
planes + dist + sel) + 7 rotation rounds x 6 planes ~= 100 rolls/tile.

v5 cuts the roll count ~5x with no change to the routing math:

1. All word planes ride ONE stacked [W*R, L] roll per round (the lane
   rotate is per-vreg work; stacking amortizes the per-op overhead).
2. dist (7 bits) and sel (1 bit at bit 7) pack into a single aux plane —
   one aux roll per round instead of two.
3. The merge's four 8-bit plane dots per word become one
   [2R, 2R] @ [2R, 4L] dot (planes side by side along lanes).

Collision-freeness of the pack rounds is untouched (same per-plane
select math); fusing the rotation INTO the pack distances was tried and
property-tested NOT collision-free (cyclic monotone routing breaks the
monotone-deficit invariant), so rotation stays a separate butterfly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction_v4 import _from_words, _to_words, best_rows

__all__ = ["compact_v5"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_SEL = 128  # sel bit in the aux plane (dist occupies bits 0..6)


def _pack_rotate_stacked(stk, aux, rot, nwords, R):
    """Stacked butterfly pack + row rotation.

    stk: [nwords*R, L] i32 word planes; aux: [R, L] dist|sel<<7;
    rot: [R, 1] right-rotation per row. Returns rotated packed planes."""
    W = nwords
    # --- pack: move selected elements left by their deficit -------------
    for k in range(7):
        s = 1 << k
        bit = jnp.int32(s)
        c = pltpu.roll(stk, L - s, 1)           # left-roll by s
        ca = pltpu.roll(aux, L - s, 1)
        take = ((ca & _SEL) != 0) & ((ca & bit) != 0)     # [R, L]
        takes = jnp.concatenate([take] * W, axis=0)       # [W*R, L]
        stk = jnp.where(takes, c, stk)
        vacated = (aux & bit) != 0
        aux = jnp.where(take, ca, jnp.where(vacated, aux & (~_SEL & 0xFF), aux))
    # --- rotate each row right by rot[r] --------------------------------
    rots = jnp.concatenate([rot] * W, axis=0)             # [W*R, 1]
    for k in range(7):
        s = 1 << k
        do = (rots & jnp.int32(s)) != 0
        stk = jnp.where(do, pltpu.roll(stk, s, 1), stk)
    return stk


def _v5_kernel(bases_ref, mask_ref, *refs, nwords: int, tiles: int,
               rows: int):
    """Identical I/O contract to compaction_v4._v4_kernel."""
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
        b = s % 2
        abase = pl.multiple_of(s * R, R)
        return pltpu.make_async_copy(
            stage.at[b], out.at[:, pl.ds(abase, R), :], sems.at[b])

    m = mask_ref[:]                                    # [R,L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)              # [L,L]
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [R,L]
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [R,1]
    rRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (cRi < rRi).astype(jnp.float32)
    excl_row = jnp.dot(triR, cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)             # [R,1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    S = rem + excl_row                                 # [R,1] output starts
    rot = S % L

    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*R, L]
    stk = _pack_rotate_stacked(stk, aux, rot, nwords, R)

    # --- MXU merge (v4 math; one wide dot per word) ----------------------
    row2R = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 0)
    q = S // L
    iota_acc = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)
    ohT = (iota_acc == q).astype(jnp.float32)          # [R,2R]
    ohT1 = (iota_acc == q + 1).astype(jnp.float32)
    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)
    dnT = (((0,), (0,)), ((), ()))
    oh2 = jnp.concatenate([ohT, ohT1], axis=0)         # [2R, 2Rout]
    m2f = jnp.concatenate([mA, mB], axis=0).astype(jnp.float32)
    union = jax.lax.dot_general(oh2, m2f, dnT, **DP)   # [2R, L]
    covered = union > 0.5

    @pl.when(flush & (slot >= 2))
    def _():
        _dma(slot - 2).wait()

    for wi in range(nwords):
        a = acc.at[wi]

        @pl.when(t == 0)
        def _(a=a):
            a[:] = jnp.zeros((2 * R, L), jnp.int32)

        v = stk[wi * R:(wi + 1) * R]
        v2 = jnp.concatenate([v * mA, v * mB], axis=0)  # [2R, L]
        # all four 8-bit planes in one dot: rhs [2R, 4L]
        planes = jnp.concatenate(
            [((v2 >> shift) & 0xFF).astype(jnp.float32)
             for shift in (0, 8, 16, 24)], axis=1)
        p4 = jax.lax.dot_general(oh2, planes, dnT, **DP)  # [2R, 4L]
        contrib = (p4[:, 0 * L:1 * L].astype(jnp.int32)
                   | (p4[:, 1 * L:2 * L].astype(jnp.int32) << 8)
                   | (p4[:, 2 * L:3 * L].astype(jnp.int32) << 16)
                   | (p4[:, 3 * L:4 * L].astype(jnp.int32) << 24))
        carry = jnp.where(row2R < R, a[:], 0)
        a[:] = jnp.where(covered, contrib, carry)

        @pl.when(flush)
        def _(a=a, wi=wi):
            stage[slot % 2, wi] = a[pl.ds(0, R), :]
            a[:] = jnp.where(row2R < R, pltpu.roll(a[:], R, 0), 0)

    @pl.when(flush)
    def _():
        _dma(slot).start()

    @pl.when(t == tiles - 1)
    def _():
        S = nxt // TILE

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


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def compact_v5(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 8):
    """Drop-in replacement for compact_v4 (same contract)."""
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

    words = []
    col_meta = []
    for c in cols:
        ws, meta = _to_words(c)
        col_meta.append((len(ws), meta))
        words.extend(w.reshape(-1, L) for w in ws)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v5_kernel, nwords=nwords, tiles=tiles,
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
        outs_i = [out3d[pos + j].reshape(-1) for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count
