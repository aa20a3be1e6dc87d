"""Split-kernel MXU stream compaction (the TPU filter fast path).

Mosaic compile time explodes when a single kernel combines several
[T,T] vector-compare builds (TOOLCHAIN_NOTES.md), so the design splits:

  kernel A  (tri matmul):       mask tile -> within-tile positions
  XLA glue  (cumsum on [tiles]): per-tile output bases
  kernel B  (one-hot matmuls):  place rows at rem+pos, carry partial
                                 tiles in VMEM, DMA full aligned tiles

Kernel B needs no sequential scalar state: bases are precomputed, so each
grid step derives rem/slot/flush from the prefetched bases array. The
VMEM carry buffers still rely on sequential grid execution.

HBM traffic: 8 B/row in + 8 B/row out per 64-bit column (word streams;
16-bit planes are built and repacked in-register). Exactness: each
one-hot row sums exactly one selected value and 16-bit magnitudes are
exact in f32.

All pallas calls trace under `jax.enable_x64(False)` (the engine runs
x64 globally; Mosaic cannot lower 64-bit-promoted IR).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_split", "TILE"]

TILE = 1024


def _positions_kernel(mask_ref, pos_ref):
    """pos[j] = inclusive prefix count - 1 (tri matmul; no cumsum in
    Mosaic)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tri = (ci <= ri).astype(jnp.float32)
    incl = jnp.dot(tri, mask_ref[:].astype(jnp.float32)[:, None],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)[:, 0]
    pos_ref[:] = incl.astype(jnp.int32) - 1


def _place_kernel(bases_ref, pos_ref, mask_ref, *refs, nwords: int,
                  tiles: int):
    """Place all word streams' rows at rem+pos; flush full aligned tiles.

    refs: nwords word tiles [TILE]i32, nwords HBM outs, then scratch:
    nwords vouts, nwords carries, sems[nwords].

    MXU shape: each one-hot (lo, then hi — sequential so only one [T,T]
    f32 is live, scoped VMEM is ~16 MB) multiplies a [T, 2*nwords] plane
    matrix in ONE dot; output columns are extracted with [2n,1] selector
    matmuls because strided column reads miscompile (TOOLCHAIN_NOTES.md).

    bases_ref: scalar-prefetch [tiles+1] exclusive output bases.
    """
    ins = refs[:nwords]
    outs = refs[nwords:2 * nwords]
    vouts = refs[2 * nwords:3 * nwords]
    carries = refs[3 * nwords:4 * nwords]
    sems = refs[4 * nwords]

    t = pl.program_id(0)
    base = bases_ref[t]
    nxt = bases_ref[t + 1]
    rem = base % TILE
    slot = base // TILE
    flush = (nxt // TILE) > slot          # this tile completes the slot
    target = pos_ref[:] + rem
    sel = mask_ref[:][None, :] == 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]

    HP = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    K = 2 * nwords
    # plane matrix [TILE, K] assembled via one-hot column scatter matmuls?
    # No: built by summing outer products is wasteful — build by concat
    # of [TILE,1] views (concatenate along lanes lowers fine, unlike
    # stack+strided-read).
    planes = []
    for w in ins:
        x = w[:]
        planes.append((x & jnp.int32(0xFFFF)).astype(jnp.float32)[:, None])
        planes.append((jax.lax.shift_right_logical(x, jnp.int32(16))
                       & jnp.int32(0xFFFF)).astype(jnp.float32)[:, None])
    P_mat = jnp.concatenate(planes, axis=1)     # [TILE, K]
    ck = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]

    def permute(shift):
        ri = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        P = ((target[None, :] == ri + shift) & sel).astype(jnp.float32)
        Y = jnp.dot(P, P_mat, **HP)             # [TILE, K]
        words = []
        for wi in range(nwords):
            # column extraction via selector matmul (strided reads unsafe)
            e0 = (ck == 2 * wi).astype(jnp.float32)[:, None]
            e1 = (ck == 2 * wi + 1).astype(jnp.float32)[:, None]
            a = jnp.dot(Y, e0, **HP)[:, 0].astype(jnp.int32)
            b = jnp.dot(Y, e1, **HP)[:, 0].astype(jnp.int32)
            words.append(a | jax.lax.shift_left(b, jnp.int32(16)))
        return words

    new_los = permute(jnp.int32(0))
    new_his = permute(jnp.int32(TILE))

    @pl.when(flush)
    def _():
        for wi in range(nwords):
            vouts[wi][:] = jnp.where(lane < rem, carries[wi][:],
                                     new_los[wi])
            carries[wi][:] = new_his[wi]
        abase = pl.multiple_of(slot * TILE, TILE)
        for wi in range(nwords):
            pltpu.make_async_copy(vouts[wi], outs[wi].at[pl.ds(abase, TILE)],
                                  sems.at[jnp.int32(wi)]).start()
        for wi in range(nwords):
            pltpu.make_async_copy(vouts[wi], outs[wi].at[pl.ds(abase, TILE)],
                                  sems.at[jnp.int32(wi)]).wait()

    @pl.when(jnp.logical_not(flush))
    def _():
        for wi in range(nwords):
            carries[wi][:] = jnp.where(lane < rem, carries[wi][:],
                                       new_los[wi])

    @pl.when(t == tiles - 1)
    def _():
        fbase = pl.multiple_of((nxt // TILE) * TILE, TILE)
        for wi in range(nwords):
            pltpu.make_async_copy(carries[wi],
                                  outs[wi].at[pl.ds(fbase, TILE)],
                                  sems.at[jnp.int32(wi)]).start()
        for wi in range(nwords):
            pltpu.make_async_copy(carries[wi],
                                  outs[wi].at[pl.ds(fbase, TILE)],
                                  sems.at[jnp.int32(wi)]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_split(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
                  interpret: bool = False):
    """Compact 64-bit columns by mask (split-kernel MXU path).

    mask: bool[n], n % TILE == 0; cols: int64/uint64 arrays (f64 payloads
    as int64 bit views). Returns (tuple of compacted cols padded to
    n+TILE, count scalar)."""
    n = mask.shape[0]
    assert n % TILE == 0
    tiles = n // TILE
    m32 = mask.astype(jnp.int32)

    with jax.enable_x64(False):
        pos = pl.pallas_call(
            _positions_kernel,
            grid=(tiles,),
            in_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
            interpret=interpret,
        )(m32)

    counts = pos[TILE - 1::TILE] + 1                    # [tiles]
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(counts, dtype=jnp.int32)])          # [tiles+1]
    count = bases[-1]

    words = []
    for c in cols:
        pair = jax.lax.bitcast_convert_type(c.astype(jnp.int64), jnp.int32)
        words.append(pair[:, 0])
        words.append(pair[:, 1])
    nwords = len(words)

    kernel = functools.partial(_place_kernel, nwords=nwords, tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((TILE,), lambda i, b: (i,),
                               memory_space=pltpu.VMEM)] * (2 + nwords),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nwords,
        scratch_shapes=[
            *[pltpu.VMEM((TILE,), jnp.int32) for _ in range(2 * nwords)],
            pltpu.SemaphoreType.DMA((nwords,)),
        ],
    )
    with jax.enable_x64(False):
        word_outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n + TILE,), jnp.int32)
                       for _ in range(nwords)],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bases, pos, m32, *words)

    back = []
    for i, c in enumerate(cols):
        lo = word_outs[2 * i].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        v = (word_outs[2 * i + 1].astype(jnp.int64) << jnp.int64(32)) | lo
        back.append(v.astype(c.dtype) if c.dtype != jnp.int64 else v)
    return tuple(back), count
