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


def _place_kernel(bases_ref, pos_ref, mask_ref, w_ref, o_ref,
                  vout, carry, sem, *, tiles: int):
    """Place ONE word stream's rows at rem+pos; flush full aligned tiles.

    One pallas invocation per 32-bit word stream: Mosaic's compile helper
    degrades superlinearly with one-hot/matmul count per kernel
    (TOOLCHAIN_NOTES.md), so the P matrices are rebuilt per word — extra
    MXU work (cheap) for a reliably-compiling kernel shape.

    bases_ref: scalar-prefetch [tiles+1] exclusive output bases.
    """
    t = pl.program_id(0)
    base = bases_ref[t]
    nxt = bases_ref[t + 1]
    rem = base % TILE
    slot = base // TILE
    flush = (nxt // TILE) > slot          # this tile completes the slot
    target = pos_ref[:] + rem
    sel = mask_ref[:][None, :] == 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]

    # per-plane matmuls: jnp.stack + strided column reads miscompile on
    # this Mosaic (silent wrong results — TOOLCHAIN_NOTES.md), so each
    # 16-bit plane rides its own [T,T]@[T,1] product (exact: one-hot rows
    # sum a single sub-2^16 value; MXU needs Precision.HIGHEST or inputs
    # get truncated to bf16). The lo/hi one-hots are built sequentially so
    # only one [T,T] f32 matrix is live at a time (scoped VMEM is ~16 MB).
    HP = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    x = w_ref[:]
    p0 = (x & jnp.int32(0xFFFF)).astype(jnp.float32)[:, None]
    p1 = (jax.lax.shift_right_logical(x, jnp.int32(16))
          & jnp.int32(0xFFFF)).astype(jnp.float32)[:, None]

    def permute(shift):
        ri = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        P = ((target[None, :] == ri + shift) & sel).astype(jnp.float32)
        a = jnp.dot(P, p0, **HP)[:, 0].astype(jnp.int32)
        b = jnp.dot(P, p1, **HP)[:, 0].astype(jnp.int32)
        return a | jax.lax.shift_left(b, jnp.int32(16))

    new_lo = permute(jnp.int32(0))
    new_hi = permute(jnp.int32(TILE))
    combined_lo = jnp.where(lane < rem, carry[:], new_lo)

    @pl.when(flush)
    def _():
        vout[:] = combined_lo
        carry[:] = new_hi
        abase = pl.multiple_of(slot * TILE, TILE)
        pltpu.make_async_copy(vout, o_ref.at[pl.ds(abase, TILE)],
                              sem).start()
        pltpu.make_async_copy(vout, o_ref.at[pl.ds(abase, TILE)],
                              sem).wait()

    @pl.when(jnp.logical_not(flush))
    def _():
        carry[:] = combined_lo

    @pl.when(t == tiles - 1)
    def _():
        fbase = pl.multiple_of((nxt // TILE) * TILE, TILE)
        pltpu.make_async_copy(carry, o_ref.at[pl.ds(fbase, TILE)],
                              sem).start()
        pltpu.make_async_copy(carry, o_ref.at[pl.ds(fbase, TILE)],
                              sem).wait()


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

    kernel = functools.partial(_place_kernel, tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((TILE,), lambda i, b: (i,),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    word_outs = []
    with jax.enable_x64(False):
        for w in words:
            (out,) = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((n + TILE,), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(bases, pos, m32, w)
            word_outs.append(out)

    back = []
    for i, c in enumerate(cols):
        lo = word_outs[2 * i].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        v = (word_outs[2 * i + 1].astype(jnp.int64) << jnp.int64(32)) | lo
        back.append(v.astype(c.dtype) if c.dtype != jnp.int64 else v)
    return tuple(back), count
