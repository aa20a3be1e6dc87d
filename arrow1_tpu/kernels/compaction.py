"""Pallas MXU stream compaction (filter materialization).

The reference's filter hot loop walks the selection bitmap and memcpys
runs (vector_selection.cc:611-760). The XLA translation
(cumsum+scatter/gather) is correct but gather-bound: TPU gathers run near
1 element/cycle, far off the HBM roofline. This kernel reaches for the
MXU instead:

  per 1024-row tile:
    incl   = tri @ mask                 # prefix sum on the MXU (Mosaic
    pos    = incl - 1                   #  has no cumsum lowering)
    target = rem + pos                  # rem = rows pending in the carry
    P_lo[i,j] = (target[j]==i)   & mask[j]     # [T,T] one-hots, in-register
    P_hi[i,j] = (target[j]==i+T) & mask[j]
    lo/hi  = P @ planes                 # MXU compaction, exact (see below)
    if rem+cnt >= T: DMA (carry ∪ lo) at aligned base; carry = hi
    else:            carry = carry ∪ lo

Mosaic requires DMA offsets provably tile-aligned (1024 for i32), so a
VMEM carry buffer holds the sub-tile remainder between flushes — each
flush writes exactly one aligned tile. Cross-tile state (carry, base,
rem) relies on TPU grid steps executing sequentially.

Exactness: 64-bit values travel as four uint16 bit-planes — each one-hot
row selects exactly one value, and uint16 magnitudes are exact in f32.
Layout: every stream is 1-D [n] int32; a 64-bit column splits into lo/hi
word streams outside the kernel (bitcast i64->i32x2 — supported by the
TPU x64 rewriter; f64 columns enter as int64 *bit views* made at ingest
because f64->bits is not lowerable on-device, while bits->f64 is).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_u64", "compact_u64_xla", "TILE"]

TILE = 1024


def _compaction_kernel(mask_ref, *refs, nwords: int, tiles: int):
    ins = refs[:nwords]                 # [TILE] i32 word streams
    outs = refs[nwords:2 * nwords]      # HBM [n+TILE] i32
    cnt_ref = refs[2 * nwords]          # VMEM [TILE] i32 out (count bcast)
    state = refs[2 * nwords + 1]        # SMEM [2] scratch: base, rem
    vouts = refs[2 * nwords + 2: 2 * nwords + 2 + nwords]   # VMEM [TILE]
    carries = refs[2 * nwords + 2 + nwords:
                   2 * nwords + 2 + 2 * nwords]             # VMEM [TILE]
    sems = refs[2 * nwords + 2 + 2 * nwords]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state[0] = 0  # base (aligned output offset)
        state[1] = 0  # rem  (valid rows in carry)

    m = mask_ref[:]                     # [TILE] i32 0/1
    ri = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tri = (ci <= ri).astype(jnp.float32)
    incl = jnp.dot(tri, m.astype(jnp.float32)[:, None],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)[:, 0]
    pos = incl.astype(jnp.int32) - 1
    cnt = pos[TILE - 1] + 1
    rem = state[1]
    target = pos + rem
    selected = m[None, :] == 1
    P_lo = ((target[None, :] == ri) & selected).astype(jnp.float32)
    P_hi = ((target[None, :] == ri + TILE) & selected).astype(jnp.float32)

    planes = []
    for w in ins:
        x = w[:]
        planes.append((x & jnp.int32(0xFFFF)).astype(jnp.float32))
        planes.append((jax.lax.shift_right_logical(x, jnp.int32(16))
                       & jnp.int32(0xFFFF)).astype(jnp.float32))
    P = jnp.stack(planes, axis=1)       # [TILE, 2*nwords] f32
    lo_p = jnp.dot(P_lo, P, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    hi_p = jnp.dot(P_hi, P, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    lo_i = lo_p.astype(jnp.int32)
    hi_i = hi_p.astype(jnp.int32)

    total = rem + cnt
    flush = total >= TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]

    combined_los = []
    new_his = []
    for wi in range(nwords):
        new_lo = lo_i[:, 2 * wi] | jax.lax.shift_left(
            lo_i[:, 2 * wi + 1], jnp.int32(16))
        new_hi = hi_i[:, 2 * wi] | jax.lax.shift_left(
            hi_i[:, 2 * wi + 1], jnp.int32(16))
        combined_los.append(jnp.where(lane < rem, carries[wi][:], new_lo))
        new_his.append(new_hi)

    @pl.when(flush)
    def _():
        # state[0] counts flushed tiles -> base = count*TILE is provably
        # TILE-aligned for the DMA slice
        base = pl.multiple_of(state[0] * TILE, TILE)
        for wi in range(nwords):
            vouts[wi][:] = combined_los[wi]
            pltpu.make_async_copy(
                vouts[wi], outs[wi].at[pl.ds(base, TILE)],
                sems.at[jnp.int32(wi)]).start()
        for wi in range(nwords):
            pltpu.make_async_copy(
                vouts[wi], outs[wi].at[pl.ds(base, TILE)],
                sems.at[jnp.int32(wi)]).wait()
        for wi in range(nwords):
            carries[wi][:] = new_his[wi]
        state[0] = state[0] + 1
        state[1] = total - TILE

    @pl.when(jnp.logical_not(flush))
    def _():
        for wi in range(nwords):
            carries[wi][:] = combined_los[wi]
        state[1] = total

    @pl.when(step == tiles - 1)
    def _():
        # final flush: the carry holds the (possibly partial) last tile
        fbase = pl.multiple_of(state[0] * TILE, TILE)
        for wi in range(nwords):
            pltpu.make_async_copy(
                carries[wi], outs[wi].at[pl.ds(fbase, TILE)],
                sems.at[jnp.int32(wi)]).start()
        for wi in range(nwords):
            pltpu.make_async_copy(
                carries[wi], outs[wi].at[pl.ds(fbase, TILE)],
                sems.at[jnp.int32(wi)]).wait()
        cnt_ref[:] = jnp.full((TILE,), fbase + state[1], jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_u64(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
                interpret: bool = False):
    """Compact 64-bit integer columns by a bool mask.

    mask: bool[n] (n % TILE == 0); cols: tuple of int64/uint64 [n] (f64
    payloads enter as int64 bit views). Returns (compacted cols padded to
    n+TILE — valid prefix = count, count)."""
    n = mask.shape[0]
    assert n % TILE == 0, f"pad rows to a multiple of {TILE}"
    tiles = n // TILE
    words = []
    for c in cols:
        pair = jax.lax.bitcast_convert_type(c.astype(jnp.int64), jnp.int32)
        words.append(pair[:, 0])
        words.append(pair[:, 1])
    nwords = len(words)
    kernel = functools.partial(_compaction_kernel, nwords=nwords,
                               tiles=tiles)
    out_shapes = [jax.ShapeDtypeStruct((n + TILE,), jnp.int32)
                  for _ in range(nwords)]
    out_shapes.append(jax.ShapeDtypeStruct((TILE,), jnp.int32))
    in_specs = [pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((TILE,), lambda i: (i,),
                              memory_space=pltpu.VMEM)] * nwords
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * nwords
    out_specs.append(pl.BlockSpec((TILE,), lambda i: (0,),
                                  memory_space=pltpu.VMEM))
    # Mosaic cannot lower under jax_enable_x64 (64-bit literal promotion
    # poisons the kernel IR — TOOLCHAIN_NOTES.md); the kernel is written in
    # explicit 32-bit types, so trace it with x64 off. The context only
    # affects python-literal promotion inside the call — the i32 operands
    # pass through unchanged.
    with jax.enable_x64(False):
        results = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.SMEM((2,), jnp.int32),
                *[pltpu.VMEM((TILE,), jnp.int32) for _ in range(2 * nwords)],
                pltpu.SemaphoreType.DMA((nwords,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(mask.astype(jnp.int32), *words)
    word_outs, count = results[:nwords], results[nwords][0]
    back = []
    for i, c in enumerate(cols):
        lo = word_outs[2 * i].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        hi = word_outs[2 * i + 1].astype(jnp.int64)
        v = (hi << jnp.int64(32)) | lo
        back.append(v.astype(c.dtype) if c.dtype != jnp.int64 else v)
    return tuple(back), count


def compact_u64_xla(mask, cols):
    """XLA gather compaction — oracle + non-TPU fallback."""
    n = mask.shape[0]
    count = jnp.sum(mask, dtype=jnp.int32)
    positions = jnp.cumsum(mask, dtype=jnp.int32) - 1
    rows = jnp.arange(n, dtype=jnp.int32)
    scatter_to = jnp.where(mask, positions, n)
    idx = jnp.zeros(n, dtype=jnp.int32).at[scatter_to].set(rows, mode="drop")
    return tuple(c[idx] for c in cols), count
