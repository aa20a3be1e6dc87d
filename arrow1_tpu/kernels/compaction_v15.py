"""Stream compaction v15: predicate + projection fused INTO the kernel.

The r5 cost model (benchmarks/r5/results_tpu_r5.json): the w4 kernel
runs 1.654 ms but the XLA pre-pass feeding it (mask + projection
planes) costs ~1 ms — ~0.35 ms of it pure HBM round-trip (write mask +
proj planes, read them back). v15 removes the round trip: the kernel
reads the RAW input planes, evaluates the caller's predicate and
projection closures on each [R, L] block in-VMEM, and compacts the
emitted planes — nothing but the inputs is ever read from HBM and
nothing but the compacted output is written. This is the Gandiva
design point (cpp/src/gandiva/filter.h:66 + projector.h:41: one fused
per-batch loop evaluating expression + selection together), realized
as a Pallas kernel.

Differences from v14 (same butterfly + one-dot routing core):
- No mask input and no prefetched `bases`: the per-step survivor count
  comes from the in-kernel prefix dots and the global output position
  rides an SMEM carry across the (sequential) grid. The kernel emits
  `count` itself.
- Banded output window with an OVERFLOW FLAG instead of v14's
  two-program lax.cond: a step needing more than `band` output rows
  sets the flag (its rows are dropped); callers re-run with the full
  window — the engine's standard two-phase replan (the compiled
  analogue of GetFilterOutputSize, vector_selection.cc:61).
- int8 routing dot by default (v5e MXU int8 = 2x bf16; probed exact,
  r5_int8_kernel).

The closures receive ([R, L] i32 blocks, scalar params ref) and run
under the kernel trace: f32 planes bitcast lane-locally (free), f64
arithmetic is PLATFORM f64 — a float-float (f32 hi, f32 lo) pair, the
same representation the x64 rewriting uses outside kernels. dd.py
helpers implement the pair ops.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .butterfly import _SEL, _pack_rotate_stacked

__all__ = ["compact_fused", "compact_fused_auto"]

L = 128
DP = dict(preferred_element_type=jnp.float32)
_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))


def _v15_kernel(params_ref, *refs, n_in: int, n_out: int, steps: int,
                rows: int, band: int, dot_i8: bool,
                fused_fn: Callable, split: int = 1):
    R, W, RP = rows, n_out, band
    ins = refs[:n_in]
    out = refs[n_in]
    meta_out = refs[n_in + 1]      # [8, 128] i32: [0,0]=count [0,1]=ovf
    stage = refs[n_in + 2]         # [2, W, RP, L] i32
    carry = refs[n_in + 3]         # [W, 8, L] i32
    state = refs[n_in + 4]         # SMEM [4] i32: base, ovf, q0[2]
    sems = refs[n_in + 5]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry[:] = jnp.zeros((W, 8, L), jnp.int32)
        state[0] = 0
        state[1] = 0

    base = state[0]

    # ---- fused predicate + projection on the in-VMEM blocks ----------
    blocks = [r[...] for r in ins]
    mask, outs = fused_fn(blocks, params_ref)
    assert len(outs) == W, (len(outs), W)
    m = mask.astype(jnp.int32)

    # ---- per-row prefix (v14's tri dots, bf16 operands) --------------
    # all operands are 0/1 masks or integers <= 128 — exact in bf16,
    # and the MXU accumulates in f32 regardless, so the bf16 inputs
    # change nothing but the rate (f32xf32 runs at 1/4 on this MXU)
    mf = m.astype(jnp.bfloat16)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    incl = jnp.dot(mf, (ci <= cj).astype(jnp.bfloat16), **DP
                   ).astype(jnp.int32)
    cnt_col = jnp.dot(mf, jnp.ones((L, 1), jnp.bfloat16), **DP
                      ).astype(jnp.int32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    # cnt_col <= 128 is bf16-exact; the f32 accumulation keeps the
    # row-prefix sums (<= R*L = 32768 < 2^24) exact
    excl_row = jnp.dot((rj < ri).astype(jnp.bfloat16),
                       cnt_col.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
    cnt_step = excl_row[R - 1, 0] + cnt_col[R - 1, 0]
    base_n = base + cnt_step
    q0 = base // L

    S_all = excl_row + base % L
    rot = S_all % L
    q_rel = S_all // L

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    # ---- pack + rotate + byte planes + one-dot banded routing --------
    # split > 1 processes the output planes in independent half-stacks:
    # half h's routing DOT (MXU) has no data dependency on half h+1's
    # pack butterfly (VPU), so the scheduler may overlap them — the
    # software-pipelining lever the single-stack form cannot express.
    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)
    pdt = jnp.int8 if dot_i8 else jnp.bfloat16
    qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
    ohA = (qi == q_rel).astype(pdt)
    ohB = (qi == q_rel + 1).astype(pdt)
    OH = jnp.concatenate([ohA, ohB], axis=0)           # [2R, RP]

    def _route(group):
        Wg = len(group)
        stk = jnp.concatenate(group, axis=0)           # [Wg*R, L]
        stk = _pack_rotate_stacked(stk, aux, rot, Wg)
        stk3 = stk.reshape(Wg, R, L)
        a3 = stk3 * mA[None]
        b3 = stk3 * mB[None]
        pa = jnp.concatenate(
            [((a3 >> sh) & 0xFF).astype(pdt)
             for sh in (0, 8, 16, 24)], axis=2)        # [Wg, R, 4L]
        pb = jnp.concatenate(
            [((b3 >> sh) & 0xFF).astype(pdt)
             for sh in (0, 8, 16, 24)], axis=2)
        pab = jnp.concatenate([pa, pb], axis=1)        # [Wg, 2R, 4L]
        OH3 = jnp.concatenate([OH[None]] * Wg, axis=0)
        if dot_i8:
            X = jax.lax.dot_general(OH3, pab, _DN_ROUTE,
                                    preferred_element_type=jnp.int32)
            return ((X[:, :, 0 * L:1 * L] & 0xFF)
                    | ((X[:, :, 1 * L:2 * L] & 0xFF) << 8)
                    | ((X[:, :, 2 * L:3 * L] & 0xFF) << 16)
                    | (X[:, :, 3 * L:4 * L] << 24))
        X = jax.lax.dot_general(OH3, pab, _DN_ROUTE, **DP)
        return (X[:, :, 0 * L:1 * L].astype(jnp.int32)
                | (X[:, :, 1 * L:2 * L].astype(jnp.int32) << 8)
                | (X[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
                | (X[:, :, 3 * L:4 * L].astype(jnp.int32) << 24))

    if split <= 1 or W < 2:
        out_i = _route(outs)
    else:
        half = (W + split - 1) // split
        parts = [
            _route(outs[h:h + half]) for h in range(0, W, half)]
        out_i = jnp.concatenate(parts, axis=0)

    # boundary-row splice with the carried partial row
    rio = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 0)
    laneRP = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 1)
    bnd0 = base % L
    out_i = jnp.where((rio[None] == 0) & (laneRP[None] < bnd0),
                      carry[:, 0:1, :], out_i)
    r_last = base_n // L - q0
    carry[:, 0:1, :] = jnp.sum(
        out_i * (rio[None] == r_last), axis=1, keepdims=True)

    # band overflow: this step needed more output rows than the window
    state[1] = state[1] | jnp.where(r_last + 1 > RP, 1, 0)
    state[0] = base_n

    # ---- overlapping serialized DMA ---------------------------------
    slot = step % 2
    stage[slot] = out_i
    state[2 + slot] = q0

    def _dma(s, q):
        return pltpu.make_async_copy(
            stage.at[s % 2], out.at[:, pl.ds(q, RP), :], sems.at[s % 2])

    @pl.when(step >= 1)
    def _():
        _dma(step - 1, state[2 + (step - 1) % 2]).wait()

    _dma(step, q0).start()

    @pl.when(step == steps - 1)
    def _():
        _dma(step, q0).wait()
        z = jnp.zeros((8, L), jnp.int32)
        r0 = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
        l0 = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        meta_out[...] = jnp.where(
            (r0 == 0) & (l0 == 0), base_n,
            jnp.where((r0 == 0) & (l0 == 1), state[1], z))


@functools.partial(
    jax.jit, static_argnames=("fused_fn", "n_out", "interpret", "rows",
                              "band", "out_limit", "dot", "split"))
def compact_fused(planes: Tuple[jnp.ndarray, ...], fused_fn,
                  n_out: int, params=None, interpret: bool = False,
                  rows: int = 256, band: int = 152, out_limit=None,
                  dot: str = "i8", split: int = 1):
    """Fused filter+project compaction over raw i32 input planes.

    planes: [n] i32 arrays (bitcast f32 planes to i32 at ingest; the
    closure bitcasts back lane-locally for free).
    fused_fn(blocks, params_ref) -> (mask [R,L] bool,
    out_planes list of n_out [R,L] i32) — MUST be a top-level function
    or functools.partial (jit caches on its identity). `params` is a
    small i32 vector of runtime scalars (thresholds etc., bitcast as
    needed) delivered to the closure as a scalar-prefetch ref.

    Returns (out_planes tuple of [out_limit] i32, count, overflowed).
    On overflowed=True the banded window clipped at least one step —
    re-run with band = rows + 9 (always sufficient).
    """
    R = rows
    n = planes[0].shape[0]
    assert n % (R * L) == 0, (n, R * L)
    steps = n // (R * L)
    full_band = R + 9
    band = min(band, full_band)
    out_rows = n // L + full_band
    p2 = [p.reshape(-1, L) for p in planes]
    n_in = len(p2)
    kernel = functools.partial(_v15_kernel, n_in=n_in, n_out=n_out,
                               steps=steps, rows=R, band=band,
                               dot_i8=dot == "i8", fused_fn=fused_fn,
                               split=split)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, n_out, band, L), jnp.int32),
            pltpu.VMEM((n_out, 8, L), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if params is None:
        params = jnp.zeros(1, jnp.int32)
    with jax.enable_x64(False):
        out3d, meta = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n_out, out_rows, L),
                                            jnp.int32),
                       jax.ShapeDtypeStruct((8, L), jnp.int32)),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(params, *p2)
    outs = tuple(out3d[j].reshape(-1)[:out_limit] for j in range(n_out))
    return outs, meta[0, 0], meta[0, 1] != 0


def compact_fused_auto(planes, fused_fn, n_out, params=None,
                       interpret=False, rows=256, sel_hint=0.5,
                       out_limit=None, dot="i8"):
    """Eager two-phase driver: run with a selectivity-sized band, and
    on the (host-synced) overflow flag re-run with the full window —
    the engine's standard replan (the compiled analogue of
    GetFilterOutputSize two-phase sizing, vector_selection.cc:61).
    Returns (out_planes, count)."""
    band = min(rows + 9, int(rows * max(sel_hint, 0.0)) + 24)
    outs, count, ovf = compact_fused(
        planes, fused_fn, n_out, params=params, interpret=interpret,
        rows=rows, band=band, out_limit=out_limit, dot=dot)
    if bool(jax.device_get(ovf)):
        outs, count, ovf = compact_fused(
            planes, fused_fn, n_out, params=params, interpret=interpret,
            rows=rows, band=rows + 9, out_limit=out_limit, dot=dot)
        assert not bool(jax.device_get(ovf))
    return outs, count
