"""MXU grouped aggregation: segment sum/count as one-hot matmul.

The reference's grouped-aggregate hot loop is a serial scatter
(`sums[g[i]] += values[i]`, hash_aggregate.cc:522-590). On TPU, for group
counts that fit VMEM (G <= ~4096), the aggregation is a matmul:

    onehot[t, g] = (gid[t] == g)          # built in-register per tile
    acc[g]      += values[t] @ onehot     # 128x128 systolic array

The group accumulator lives in VMEM scratch across the (sequential) grid
steps and is DMA'd to HBM once at the end — each input element is read
exactly once from HBM.

Toolchain constraints honored (TOOLCHAIN_NOTES.md): traced under
enable_x64(False); row-vector matmuls (no transpose); Precision.HIGHEST
(default MXU precision truncates f32 operands to bf16); outputs are
ANY-space HBM buffers written by explicit DMA (the blocked-output pattern
with constant index maps crashed this compile helper).

Falls back to XLA scatter-add (segment_sum_count_xla) when G is large or
the backend is not TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["segment_sum_count", "segment_sum_count_xla"]

TILE = 1024

HP = dict(preferred_element_type=jnp.float32,
          precision=jax.lax.Precision.HIGHEST)


def _segsum_kernel(gid_ref, val_ref, live_ref, sum_ref, cnt_ref,
                   acc_sum, acc_cnt, sems, *, ngroups, tiles):
    """Grid: one step per row tile. acc_* are VMEM scratch [1, G]."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_sum[:] = jnp.zeros((1, ngroups), jnp.float32)
        acc_cnt[:] = jnp.zeros((1, ngroups), jnp.float32)

    gid = gid_ref[:]                     # [TILE] int32
    val = val_ref[:]                     # [TILE] f32
    live = live_ref[:]                   # [TILE] i32 0/1
    groups = jax.lax.broadcasted_iota(jnp.int32, (TILE, ngroups), 1)
    onehot = (gid[:, None] == groups).astype(jnp.float32)
    onehot = onehot * live[:, None].astype(jnp.float32)
    acc_sum[:] += jnp.dot(val[None, :], onehot, **HP)
    acc_cnt[:] += jnp.dot(jnp.ones((1, TILE), jnp.float32), onehot, **HP)

    @pl.when(step == tiles - 1)
    def _():
        pltpu.make_async_copy(acc_sum, sum_ref, sems.at[jnp.int32(0)]).start()
        pltpu.make_async_copy(acc_cnt, cnt_ref, sems.at[jnp.int32(1)]).start()
        pltpu.make_async_copy(acc_sum, sum_ref, sems.at[jnp.int32(0)]).wait()
        pltpu.make_async_copy(acc_cnt, cnt_ref, sems.at[jnp.int32(1)]).wait()


@functools.partial(jax.jit, static_argnames=("ngroups", "interpret"))
def segment_sum_count(gid: jnp.ndarray, values: jnp.ndarray,
                      live: jnp.ndarray, ngroups: int,
                      interpret: bool = False):
    """Pallas MXU path. gid int32[n], values f32[n], live bool[n].
    Returns (sums f32[ngroups], counts f32[ngroups]). n must be a multiple
    of TILE (callers pad with live=False); ngroups a multiple of 128."""
    n = gid.shape[0]
    assert n % TILE == 0, f"pad rows to multiple of {TILE}"
    assert ngroups % 128 == 0, "pad ngroups to a lane multiple"
    tiles = n // TILE
    kernel = functools.partial(_segsum_kernel, ngroups=ngroups, tiles=tiles)
    with jax.enable_x64(False):  # Mosaic cannot lower x64-promoted IR
        sums, counts = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=[
                jax.ShapeDtypeStruct((1, ngroups), jnp.float32),
                jax.ShapeDtypeStruct((1, ngroups), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, ngroups), jnp.float32),
                pltpu.VMEM((1, ngroups), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(gid, values.astype(jnp.float32), live.astype(jnp.int32))
    return sums[0], counts[0]


def segment_sum_count_xla(gid, values, live, ngroups):
    """XLA scatter fallback — the parity oracle for the Pallas kernel."""
    v = jnp.where(live, values.astype(jnp.float32), 0.0)
    sums = jnp.zeros(ngroups, jnp.float32).at[gid].add(v, mode="drop")
    counts = jnp.zeros(ngroups, jnp.float32).at[gid].add(
        live.astype(jnp.float32), mode="drop")
    return sums, counts
