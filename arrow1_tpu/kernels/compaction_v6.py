"""Butterfly stream compaction — v6: multi-TILE stacked rolls.

v5 stacks the W word planes of ONE [R, L] tile into a single
[W*R, L] roll per butterfly round. The roll micro-ablation
(benchmarks/r2/ablate_v4.py micro3) asks whether the cross-lane roll
cost is ~flat in stack height; if so, the dominant per-round cost is
per-OP, not per-row, and stacking T tiles into one [T*W*R, L] roll
divides it by T. v6 is exactly that: each grid step loads T tiles,
packs + rotates all of them in the same 7+7 butterfly rounds (the
routing math is row-local, so tiles stack transparently), then runs
the MXU merge per tile sequentially (the merge is dot-dominated and
already cheap; its accumulator/DMA slot discipline is v5's).

Reference semantics unchanged: filter with drop-null emit order
(cpp/src/arrow/compute/kernels/vector_selection.cc:570-830); exactness
property-tested against the eager oracle in interpret mode and on TPU
by tests/test_compact_v5.py's shared harness.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction_v4 import _from_words, _to_words

__all__ = ["compact_v6"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_SEL = 128  # sel bit in the aux plane (dist occupies bits 0..6)


def _pack_rotate_stacked(stk, aux, rot, copies: int):
    """v5's stacked butterfly, height-agnostic.

    stk: [copies*H, L] i32 planes sharing routing; aux: [H, L]
    dist|sel<<7; rot: [H, 1] right-rotation per row."""
    for k in range(7):
        s = 1 << k
        bit = jnp.int32(s)
        c = pltpu.roll(stk, L - s, 1)           # left-roll by s
        ca = pltpu.roll(aux, L - s, 1)
        take = ((ca & _SEL) != 0) & ((ca & bit) != 0)     # [H, L]
        takes = jnp.concatenate([take] * copies, axis=0)  # [copies*H, L]
        stk = jnp.where(takes, c, stk)
        vacated = (aux & bit) != 0
        aux = jnp.where(take, ca,
                        jnp.where(vacated, aux & (~_SEL & 0xFF), aux))
    rots = jnp.concatenate([rot] * copies, axis=0)        # [copies*H, 1]
    for k in range(7):
        s = 1 << k
        do = (rots & jnp.int32(s)) != 0
        stk = jnp.where(do, pltpu.roll(stk, s, 1), stk)
    return stk


def _v6_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
               rows: int, t_tiles: int):
    """I/O contract: per grid step, mask block [T*R, L] and one
    [T*R, L] block per word plane; accumulator/staging/DMA identical
    to compaction_v5._v5_kernel but driven per tile inside the step."""
    R = rows
    T = t_tiles
    H = T * R
    ins = refs[:nwords]
    out = refs[nwords]
    acc = refs[nwords + 1]
    stage = refs[nwords + 2]
    sems = refs[nwords + 3]
    TILE = R * L

    step = pl.program_id(0)

    def _dma(s):
        b = s % 2
        abase = pl.multiple_of(s * R, R)
        return pltpu.make_async_copy(
            stage.at[b], out.at[:, pl.ds(abase, R), :], sems.at[b])

    m = mask_ref[:]                                    # [H, L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)              # [L, L]
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [H, L]
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [H, 1]
    # per-TILE exclusive row prefix of counts: block-triangular [H, H]
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

    # per-tile bases: rem/slot/flush for tile j of this step
    base_j = [bases_ref[step * T + j] for j in range(T)]
    nxt_j = [bases_ref[step * T + j + 1] for j in range(T)]
    rem_rows = jnp.concatenate(
        [jnp.broadcast_to((b % TILE).reshape(1, 1), (R, 1)).astype(
            jnp.int32) for b in base_j], axis=0)
    S_all = rem_rows + excl_row                        # [H, 1] out starts
    rot = S_all % L

    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*H, L]
    stk = _pack_rotate_stacked(stk, aux, rot, nwords)

    laneR = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row2R = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 0)
    iota_acc = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)
    dnT = (((0,), (0,)), ((), ()))

    # --- sequential per-tile MXU merge (v5 math per tile) ---------------
    for j in range(T):
        slot = base_j[j] // TILE
        flush = (nxt_j[j] // TILE) > slot
        S = S_all[j * R:(j + 1) * R]                   # [R, 1]
        cnt = cnt_col[j * R:(j + 1) * R]
        rotj = rot[j * R:(j + 1) * R]
        q = S // L
        ohT = (iota_acc == q).astype(jnp.float32)      # [R, 2R]
        ohT1 = (iota_acc == q + 1).astype(jnp.float32)
        mA = ((laneR >= rotj) & (laneR < rotj + cnt)).astype(jnp.int32)
        mB = (laneR < rotj + cnt - L).astype(jnp.int32)
        oh2 = jnp.concatenate([ohT, ohT1], axis=0)     # [2R, 2Rout]
        m2f = jnp.concatenate([mA, mB], axis=0).astype(jnp.float32)
        union = jax.lax.dot_general(oh2, m2f, dnT, **DP)   # [2R, L]
        covered = union > 0.5

        @pl.when(flush & (slot >= 2))
        def _():
            _dma(slot - 2).wait()

        for wi in range(nwords):
            a = acc.at[wi]
            if j == 0:
                @pl.when(step == 0)
                def _(a=a):
                    a[:] = jnp.zeros((2 * R, L), jnp.int32)

            v = stk[(wi * T + j) * R:(wi * T + j + 1) * R]
            v2 = jnp.concatenate([v * mA, v * mB], axis=0)  # [2R, L]
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
            def _(a=a, wi=wi, slot=slot):
                stage[slot % 2, wi] = a[pl.ds(0, R), :]
                a[:] = jnp.where(row2R < R, pltpu.roll(a[:], R, 0), 0)

        @pl.when(flush)
        def _(slot=slot):
            _dma(slot).start()

    @pl.when(step == steps - 1)
    def _():
        Sfin = nxt_j[T - 1] // TILE

        @pl.when(Sfin >= 2)
        def _():
            _dma(Sfin - 2).wait()

        for wi in range(nwords):
            stage[Sfin % 2, wi] = acc[wi, pl.ds(0, R), :]
        _dma(Sfin).start()
        _dma(Sfin).wait()

        @pl.when(Sfin >= 1)
        def _():
            _dma(Sfin - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows", "t_tiles"))
def compact_v6(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 8, t_tiles: int = 4):
    """Drop-in replacement for compact_v4/v5 (same contract); processes
    t_tiles [rows, 128] tiles per grid step so every butterfly roll
    moves t_tiles x nwords planes at once."""
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

    words = []
    col_meta = []
    for c in cols:
        ws, meta = _to_words(c)
        col_meta.append((len(ws), meta))
        words.extend(w.reshape(-1, L) for w in ws)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = (n + TILE) // L

    kernel = functools.partial(_v6_kernel, nwords=nwords, steps=steps,
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
