"""MXU grouped aggregation: segment sum/count as one-hot matmul.

The reference's grouped-aggregate hot loop is a serial scatter
(`sums[g[i]] += values[i]`, hash_aggregate.cc:522-590). On TPU, for group
counts that fit VMEM (G <= ~8192), the aggregation is a matmul:

    onehot[t, g] = (gid[t] == g)          # built in-register per tile
    acc[g]      += onehot.T @ values[t]   # 128x128 systolic array

The group accumulator lives in VMEM scratch across the (sequential) grid
steps and is written to HBM once at the end — the whole aggregation reads
each input element exactly once from HBM: speed-of-light for the op.

Falls back to XLA scatter-add (ops/groupby.py) when G is large or the
backend is not TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["segment_sum_count", "segment_sum_count_xla"]

TILE = 1024  # rows per grid step (8 sublane registers of f32)


def _segsum_kernel(gid_ref, val_ref, live_ref, sum_ref, cnt_ref,
                   acc_sum, acc_cnt, *, ngroups, tiles):
    """Grid: one step per row tile. acc_* are VMEM scratch [G]."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_sum[:] = jnp.zeros_like(acc_sum)
        acc_cnt[:] = jnp.zeros_like(acc_cnt)

    gid = gid_ref[:]                     # [TILE] int32
    val = val_ref[:]                     # [TILE] f32
    live = live_ref[:]                   # [TILE] bool(int8)
    # one-hot [TILE, G] built in-register; dead rows contribute nothing
    groups = jax.lax.broadcasted_iota(jnp.int32, (TILE, ngroups), 1)
    onehot = (gid[:, None] == groups).astype(jnp.float32)
    onehot = onehot * live[:, None].astype(jnp.float32)
    # MXU: [1,TILE] @ [TILE,G] — row-vector form (transpose lowering is
    # unreliable on this Mosaic; HIGHEST precision so f32 sums don't
    # truncate operands to bf16 — TOOLCHAIN_NOTES.md)
    HP = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    acc_sum[:] += jnp.dot(val[None, :], onehot, **HP)[0, :]
    acc_cnt[:] += jnp.dot(jnp.ones((1, TILE), jnp.float32), onehot,
                          **HP)[0, :]

    @pl.when(step == tiles - 1)
    def _():
        sum_ref[:] = acc_sum[:]
        cnt_ref[:] = acc_cnt[:]


@functools.partial(jax.jit, static_argnames=("ngroups", "interpret"))
def segment_sum_count(gid: jnp.ndarray, values: jnp.ndarray,
                      live: jnp.ndarray, ngroups: int,
                      interpret: bool = False):
    """Pallas MXU path. gid int32[n], values f32[n], live bool[n].
    Returns (sums f32[ngroups], counts f32[ngroups]). n must be a multiple
    of TILE (callers pad with live=False)."""
    n = gid.shape[0]
    assert n % TILE == 0, f"pad rows to multiple of {TILE}"
    tiles = n // TILE
    kernel = functools.partial(_segsum_kernel, ngroups=ngroups, tiles=tiles)
    with jax.enable_x64(False):  # Mosaic cannot lower x64 IR
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
            out_specs=[
                pl.BlockSpec((ngroups,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ngroups,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ngroups,), jnp.float32),
                jax.ShapeDtypeStruct((ngroups,), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((ngroups,), jnp.float32),
                pltpu.VMEM((ngroups,), jnp.float32),
            ],
            interpret=interpret,
        )(gid, values.astype(jnp.float32), live.astype(jnp.int8))
    return sums, counts


def segment_sum_count_xla(gid, values, live, ngroups):
    """XLA scatter fallback — the parity oracle for the Pallas kernel."""
    v = jnp.where(live, values.astype(jnp.float32), 0.0)
    sums = jnp.zeros(ngroups, jnp.float32).at[gid].add(v, mode="drop")
    counts = jnp.zeros(ngroups, jnp.float32).at[gid].add(
        live.astype(jnp.float32), mode="drop")
    return sums, counts
