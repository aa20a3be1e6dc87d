"""Butterfly stream compaction — v11: OR-merge routing butterfly.

v9/v10 route packed rows to output rows in two phases: a flagged
OR-scan over equal-q runs (log2(H) full-stack rounds) then a sublane
butterfly moving last-of-run rows (log2(H) more). On TPU every round
is a full traversal of the [W*H, L] stack, and the measured cost of
ALL variants (~7-8 ms at 10M rows) tracks traversal count, not op
kind. v11 fuses the two phases: ONE butterfly routes EVERY row up by
d = j - (q_j - q0), OR-merging packets that collide. Merging is sound
because destinations are monotone with duplicates: if a position
receives a packet while holding one, both packets share all remaining
distance bits (proof: the receiver/holder high-bit difference would
contradict d monotonicity), so they travel together from then on;
positions nobody targets end at 0 (vacated sources are zeroed), and
every output row in [q0, q_last] IS targeted (q is contiguous).

v10 heritage (unchanged): sublane-scan prefix, wrap fold, carry row;
carry reads back from the staged output at its dynamic row index.

v9 computed the per-tile exclusive row prefix with a block-triangular
[H, H] f32 dot (two [H, H] iota builds per grid step — ~4 MB of VPU
traffic each at H=1024). v10 derives it from cnt_col with a flagged
sublane cumsum (log2(H) rolls on [H, 1], the same machinery as the
router) — tile boundaries reset the running sum.

v9 design (unchanged below): sublane-roll router, no merge dots.

v6/v7/v8 all route packed rows into output rows with one-hot MXU dots
plus a sequential accumulator ring; the r2 stage ablation prices that
merge+acc at ~75% of the 7.1 ms flagship (pack stages alone run at
10.5 G rows/s), and the roll micro-ablation prices a SUBLANE roll at
~3.1 ns/op/tile vs ~80 ns for a lane roll. v9 exploits that gap: after
the per-row butterfly pack+rotate (unchanged, compaction_v6), every
row's survivors sit at lanes [S%L, S%L+cnt) of its own plane, where S
is the row's global output element offset. Routing to output rows is
then done entirely with sublane rolls:

  1. wrap fold: the lanes that overflow past L (mask mB) belong to the
     NEXT output row, which is exactly where the next source row's
     elements start — one roll-by-1 OR-merge folds them in;
  2. run merge: consecutive source rows with the same output row q
     (small counts) OR-combine via a flagged segmented scan,
     log2(H) sublane-roll rounds;
  3. row compact: the last row of each q-run moves up to position
     q - q0 via a sublane butterfly (monotone distances, same routing
     network as the lane pack but across rows).

The step then DMAs its H output rows to out[q0 : q0+H) in one copy.
Consecutive steps' windows overlap; the writes are serialized on one
semaphore and each step's tail garbage is overwritten by the next
step's write (the final partial row rides a VMEM carry that the next
step folds into its first output row, and a one-row flush writes it
at the end). No per-tile sequential work remains: the only sequential
state is the carry row and the DMA order.

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

from .compaction_v4 import _from_words, _to_words
from .compaction_v6 import _pack_rotate_stacked, _SEL

__all__ = ["compact_v11"]

L = 128
DP = dict(preferred_element_type=jnp.float32)


def _v11_kernel(bases_ref, mask_ref, *refs, nwords: int, steps: int,
               rows: int, t_tiles: int):
    R = rows
    T = t_tiles
    W = nwords
    H = T * R
    HB = H.bit_length() - 1 if (H & (H - 1)) == 0 else H.bit_length()
    ins = refs[:W]
    out = refs[W]              # ANY [W, out_rows, L]
    stage = refs[W + 1]        # VMEM [W, H, L]
    carry = refs[W + 2]        # VMEM [W, 1, L]
    sems = refs[W + 3]         # DMA sems (2,): 0 main window, 1 flush

    step = pl.program_id(0)
    TILE = R * L

    def _window_dma(q0):
        return pltpu.make_async_copy(
            stage, out.at[:, pl.ds(q0, H), :], sems.at[0])

    # ---- per-row output offsets (v6 prefix math, global S) -----------
    m = mask_ref[:]                                    # [H, L] i32 0/1
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)   # [H, L]
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)   # [H, 1]
    # per-tile EXCLUSIVE row prefix of counts: flagged sublane cumsum
    # (v9 used a block-triangular [H, H] dot; two [H, H] iotas per step)
    rowH0 = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    Ft = ((rowH0 % R) == 0).astype(jnp.int32)          # tile boundary
    acc_c = cnt_col
    for k in range((H - 1).bit_length()):
        s = 1 << k
        okr = rowH0 >= s
        take = okr & (Ft == 0)
        acc_c = jnp.where(take, acc_c + pltpu.roll(acc_c, s, 0), acc_c)
        Ft = Ft | jnp.where(okr, pltpu.roll(Ft, s, 0), 1)
    excl_row = acc_c - cnt_col                         # [H, 1] per tile

    E = bases_ref[step * T]                            # step element base
    En = bases_ref[step * T + T]                       # next step base
    base_rows = jnp.concatenate(
        [jnp.broadcast_to(bases_ref[step * T + j].reshape(1, 1),
                          (R, 1)).astype(jnp.int32) for j in range(T)],
        axis=0)                                        # [H, 1] per-tile base
    S = base_rows + excl_row                           # [H, 1] global offset
    rot = S % L
    q0 = E // jnp.int32(L)
    q_rel = S // jnp.int32(L) - q0                     # [H, 1] in [0, H)

    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    # ---- butterfly pack + rotate (unchanged) --------------------------
    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)   # [W*H, L]
    stk = _pack_rotate_stacked(stk, aux, rot, W)

    # ---- wrap fold + carry blend (fused, minimal temporaries) ----------
    rowH = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    mA = (lane >= rot) & (lane < rot + cnt_col)        # own output row q
    mB = lane < rot + cnt_col - L                      # wraps into q+1
    mAs = jnp.concatenate([mA] * W, axis=0)
    mBs = jnp.concatenate([mB] * W, axis=0)
    vB = jnp.where(mBs, stk, 0)
    prevB = pltpu.roll(vB, 1, 0)                       # row j <- row j-1
    blend = (E % jnp.int32(L)) != 0                    # carry continues q0
    row0s = jnp.concatenate([rowH == 0] * W, axis=0)   # [W*H, 1]
    carry_stk = jnp.concatenate(
        [jnp.where(rowH == 0, carry[w], 0) for w in range(W)], axis=0)
    head = jnp.where(blend, carry_stk, 0)
    val = jnp.where(mAs, stk, 0) | jnp.where(row0s, head, prevB)

    # ---- carry B-part (folded nowhere when the LAST row wraps) ---------
    lastB = jnp.concatenate(
        [vB[(w + 1) * H - 1:(w + 1) * H] for w in range(W)], axis=0)
    wrapped = (rot[H - 1:H] + cnt_col[H - 1:H]) > L    # [1, 1] bool

    # ---- OR-merge routing butterfly: every row -> position q - q0 ------
    d = rowH - q_rel                                   # [H, 1] in [0, H)
    act = jnp.ones((H, 1), jnp.int32)
    stk2 = val
    for k in range(HB):
        s = 1 << k
        okrow = rowH < (H - s)
        cand = pltpu.roll(stk2, W * H - s, 0)          # row j <- row j+s
        ca_d = pltpu.roll(d, H - s, 0)
        ca_a = pltpu.roll(act, H - s, 0)
        take = okrow & (ca_a != 0) & ((ca_d & s) != 0)
        vac = (act != 0) & ((d & s) != 0)
        keep = (act != 0) & ~vac
        takes = jnp.concatenate([take] * W, axis=0)
        keeps = jnp.concatenate([keep] * W, axis=0)
        stk2 = (jnp.where(keeps, stk2, 0)
                | jnp.where(takes, cand, 0))
        act = (keep | take).astype(jnp.int32)
        # on keep&take both packets share all remaining distance bits
        # (bit s of the taken one is consumed by this round's move)
        d = jnp.where(take, ca_d & ~jnp.int32(s), jnp.where(keep, d, 0))

    # ---- serialized window write ---------------------------------------
    @pl.when(step > 0)
    def _():
        _window_dma(bases_ref[(step - 1) * T] // jnp.int32(L)).wait()

    stage[:] = stk2.reshape(W, H, L)
    # carry = content of output row (En-1)//L: read back from the
    # staged block at its dynamic row index; when the last source row
    # wrapped, the carry is its un-folded B-part instead. An empty
    # step (En == E) keeps the previous carry.
    cq_rel = jnp.clip(jnp.maximum(En - 1, E) // jnp.int32(L) - q0,
                      0, H - 1)
    staged_row = stage[:, pl.ds(cq_rel, 1), :]         # [W, 1, L]
    wr = jnp.broadcast_to(wrapped.astype(jnp.int32),
                          (W, 1))[:, :, None]          # [W, 1, 1]
    new_carry = jnp.where(wr != 0, lastB.reshape(W, 1, L), staged_row)
    empty = jnp.broadcast_to((En == E).reshape(1, 1, 1), (W, 1, L))
    carry[:] = jnp.where(empty, carry[:], new_carry)
    _window_dma(q0).start()

    @pl.when(step == steps - 1)
    def _():
        _window_dma(q0).wait()
        carry_q = jnp.maximum(En - 1, 0) // jnp.int32(L)
        fl = pltpu.make_async_copy(
            carry, out.at[:, pl.ds(carry_q, 1), :], sems.at[1])
        fl.start()
        fl.wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows", "t_tiles"))
def compact_v11(mask: jnp.ndarray, cols: Tuple[jnp.ndarray, ...],
               interpret: bool = False, rows: int = 128, t_tiles: int = 8):
    """Drop-in replacement for compact_v4..v8 (same contract): keeps
    rows where mask, emit order preserved, returns (cols, count). Output
    arrays are padded; entries past count are unspecified."""
    R = rows
    T = t_tiles
    TILE = R * L
    H = T * R
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
    out_rows = n // L + H + 1

    kernel = functools.partial(_v11_kernel, nwords=nwords, steps=steps,
                               rows=R, t_tiles=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((T * R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + nwords),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nwords, H, L), jnp.int32),
            pltpu.VMEM((nwords, 1, L), jnp.int32),
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
        outs_i = [out3d[pos + j].reshape(-1) for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count
