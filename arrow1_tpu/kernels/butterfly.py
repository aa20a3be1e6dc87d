"""Shared butterfly pack+rotate for the compaction kernels.

Moved verbatim from compaction_v6.py (round-3 experiment, deleted in
the round-4 consolidation — git history keeps v3/v5/v6/v8..v11; the
A/B record lives in BENCH_NOTES.md). Used by the champion (v7) and the
round-4 candidate (v12).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

__all__ = ["_SEL", "_pack_rotate_stacked"]

L = 128
_SEL = 128  # sel bit in the aux plane (dist occupies bits 0..6)


def _pack_rotate_stacked(stk, aux, rot, copies: int,
                         start_round: int = 0):
    """Stacked butterfly: pack survivors left within each row (7
    rounds over per-element deficit bits), then rotate each row right
    by its output start lane (7 rounds over rot bits).

    stk: [copies*H, L] i32 planes sharing routing; aux: [H, L]
    dist|sel<<7; rot: [H, 1] right-rotation per row.

    start_round=1 skips the shift-by-1 round on BOTH sides — exact
    when every deficit and rotation is even, which holds for
    interleaved 64-bit planes (each element owns an adjacent lane
    pair, so lane distances are 2x element distances — v13)."""
    for k in range(start_round, 7):
        s = 1 << k
        bit = jnp.int32(s)
        sel_bit = jnp.int32(_SEL | s)
        c = pltpu.roll(stk, L - s, 1)           # left-roll by s
        ca = pltpu.roll(aux, L - s, 1)
        # selected AND deficit-bit set, as one masked compare
        take = (ca & sel_bit) == sel_bit                  # [H, L]
        takes = jnp.concatenate([take] * copies, axis=0)  # [copies*H, L]
        stk = jnp.where(takes, c, stk)
        # vacated lanes (deficit bit set) drop their SEL flag: shift
        # the deficit bit up to the SEL position and clear it
        aux = jnp.where(take, ca, aux & ~((aux & bit) << (7 - k)))
    rots = jnp.concatenate([rot] * copies, axis=0)        # [copies*H, 1]
    for k in range(start_round, 7):
        s = 1 << k
        do = (rots & jnp.int32(s)) != 0
        stk = jnp.where(do, pltpu.roll(stk, s, 1), stk)
    return stk
