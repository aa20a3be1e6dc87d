"""Compaction v4 stage ablation + Mosaic per-op microbenchmarks.

Usage: python benchmarks/r2/ablate_v4.py micro stages

Goal: attribute the v4 kernel's ~6us/tile (r64, 6 words) to its stages
(butterfly pack / row rotate / MXU one-hot merge) and pin the real cost
of the primitive ops (lane roll, select, [128,128] dot) so the v5
redesign targets the right stage. Results land in results_tpu_r2.json
under ablate_*.
"""

import functools
import sys

import numpy as np

from measure_r2 import M, _record

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

L = 128
R = 64
K = 64  # chained-op repeats per kernel step


def _micro_kernel(x_ref, o_ref, *, op):
    y = x_ref[:]
    if op == "dot":
        w = jnp.eye(L, dtype=jnp.float32)
        yf = y.astype(jnp.float32)

        def body(i, yf):
            return jax.lax.dot(yf, w,
                               preferred_element_type=jnp.float32)

        yf = jax.lax.fori_loop(0, K, body, yf)
        o_ref[:] = yf.astype(jnp.int32)
        return

    def body(i, y):
        if op == "roll_lane":
            return pltpu.roll(y, 1, 1) + 1  # +1 defeats rotate-fold
        if op == "roll_sub":
            return pltpu.roll(y, 1, 0) + 1
        if op == "add":
            return y + i
        if op == "select":
            return jnp.where(y > i, y + 1, y)
        raise AssertionError(op)

    o_ref[:] = jax.lax.fori_loop(0, K, body, y)


def micro():
    m = M()
    tiles = 512
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, (tiles * R, L)),
        dtype=jnp.int32)
    for op in ("add", "select", "roll_lane", "roll_sub", "dot"):
        kern = functools.partial(_micro_kernel, op=op)

        def call(x):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(tiles,),
                    in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((R, L), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((tiles * R, L), jnp.int32),
                )(x)

        def fn(i, x):
            return jnp.sum(call(x + i)[0].astype(jnp.float64))

        per, times = m.timed(fn, (x,), inner=4)
        per_op_ns = per / tiles / K * 1e9
        _record(f"ablate_micro_{op}", ms=round(per * 1e3, 2),
                ns_per_op_per_tile=round(per_op_ns, 1),
                cycles_at_940M=round(per_op_ns * 0.94, 1),
                times=[round(t, 3) for t in times])


# ---- stage-ablated v4 -----------------------------------------------------

from arrow1_tpu.kernels.compaction_v4 import (_butterfly_pack, _rotate_rows,
                                              compact_v4)


def _staged_kernel(mask_ref, *refs, nwords: int, stage: int):
    """stage 1: prefix+butterfly only; 2: +rotate; 3: +merge math (no
    acc/DMA — outputs written to the blocked out spec either way)."""
    ins = refs[:nwords]
    outs = refs[nwords:]
    m = mask_ref[:]
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)
    incl = jnp.dot(mf, triU,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    rRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cRi = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (cRi < rRi).astype(jnp.float32)
    excl_row = jnp.dot(triR, cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    sel = m
    dist = jnp.where(sel != 0, lane + 1 - incl, 0)
    vals = _butterfly_pack([r_[:] for r_ in ins], sel, dist)
    if stage >= 2:
        S = excl_row  # rem=0 stand-in (same op count as rem + excl_row)
        rot = S % L
        vals = _rotate_rows(vals, rot)
    if stage >= 3:
        q = (excl_row // L)
        row2R = jax.lax.broadcasted_iota(jnp.int32, (2 * R, L), 0)
        iota_acc = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)
        ohT = (iota_acc == q).astype(jnp.float32)
        ohT1 = (iota_acc == q + 1).astype(jnp.float32)
        rot = excl_row % L
        mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
        mB = (lane < rot + cnt_col - L).astype(jnp.int32)
        dnT = (((0,), (0,)), ((), ()))
        oh2 = jnp.concatenate([ohT, ohT1], axis=0)
        m2f = jnp.concatenate([mA, mB], axis=0).astype(jnp.float32)
        union = jax.lax.dot_general(oh2, m2f, dnT,
                                    preferred_element_type=jnp.float32)
        covered = union > 0.5
        new_vals = []
        for wi in range(nwords):
            v = vals[wi]
            v2 = jnp.concatenate([v * mA, v * mB], axis=0)
            parts = []
            for shift in (0, 8, 16, 24):
                pf = ((v2 >> shift) & 0xFF).astype(jnp.float32)
                p = jax.lax.dot_general(oh2, pf, dnT,
                                        preferred_element_type=jnp.float32)
                parts.append(p.astype(jnp.int32))
            contrib = (parts[0] | (parts[1] << 8) |
                       (parts[2] << 16) | (parts[3] << 24))
            new_vals.append(jnp.where(covered, contrib, 0)[:R, :])
        vals = new_vals
    for wi in range(nwords):
        outs[wi][:] = vals[wi]


def stages():
    m = M()
    N = 10_000_000
    TILE = R * L
    n = N // TILE * TILE
    tiles = n // TILE
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))

    from arrow1_tpu.kernels.compaction_v4 import _to_words
    nwords = 6

    def call(mask, cols, stage):
        words = []
        for c in cols:
            ws, _ = _to_words(c)
            words.extend(w.reshape(-1, L) for w in ws)
        m2 = mask.astype(jnp.int32).reshape(-1, L)
        kern = functools.partial(_staged_kernel, nwords=nwords, stage=stage)
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                kern,
                grid=(tiles,),
                in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0))] * (
                    1 + nwords),
                out_specs=[pl.BlockSpec((R, L), lambda i: (i, 0))] * nwords,
                out_shape=[jax.ShapeDtypeStruct((tiles * R, L), jnp.int32)
                           ] * nwords,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(m2, *words)
        return outs

    for stage in (0, 1, 2, 3):
        def fn(i, key, v, fb, stage=stage):
            f = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (f > i.astype(jnp.float64) * 1e-12) & (v > jnp.int64(0))
            if stage == 0:
                # full production kernel for reference
                (ok, ov, ofb), count = compact_v4(mask, (key, v, fb), rows=R)
                return (count.astype(jnp.float64) +
                        jnp.sum(ok).astype(jnp.float64))
            outs = call(mask, (key, v, fb), stage)
            return sum(jnp.sum(o).astype(jnp.float64) for o in outs[:2])

        per, times = m.timed(fn, (key, v, fb), inner=8)
        _record(f"ablate_v4_stage{stage}", n=n, ms=round(per * 1e3, 2),
                us_per_tile=round(per / tiles * 1e6, 2),
                mrows_s=round(n / per / 1e6, 1),
                times=[round(t, 3) for t in times])


def _micro2_kernel(x_ref, o_ref, *, op):
    y = x_ref[:]

    def body(i, y):
        if op == "transpose2":
            # two transposes per iter (round trip keeps the shape)
            return jnp.swapaxes(jnp.swapaxes(y, 0, 1) + 1, 0, 1)
        if op == "transpose_dot2":
            # MXU fallback: x^T via dot_general over dim-0 identity
            eyeR = jnp.eye(R, dtype=jnp.float32)
            eyeL = jnp.eye(L, dtype=jnp.float32)
            dn = (((0,), (0,)), ((), ()))
            yt = jax.lax.dot_general(
                y.astype(jnp.float32), eyeL if y.shape[0] == L else eyeR,
                dn, preferred_element_type=jnp.float32)
            yt = yt + 1.0
            back = jax.lax.dot_general(
                yt, eyeR if yt.shape[0] == R else eyeL, dn,
                preferred_element_type=jnp.float32)
            return back.astype(jnp.int32)
        if op == "roll_lane_s64":
            return pltpu.roll(y, 64, 1) + 1
        if op == "roll_sub_s32":
            return pltpu.roll(y, 32, 0) + 1
        raise AssertionError(op)

    o_ref[:] = jax.lax.fori_loop(0, K, body, y)


def micro2():
    """Round-2 follow-ups for the v5 (transposed butterfly) design:
    transpose cost + correctness, shift-amount dependence of rolls."""
    m = M()
    tiles = 512
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, (tiles * R, L)),
        dtype=jnp.int32)
    # correctness: one in-kernel swapaxes vs host transpose (guards the
    # known Mosaic sublane-axis miscompile class, TOOLCHAIN_NOTES #3)
    def tp_once(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    try:
        with jax.enable_x64(False):
            got = pl.pallas_call(
                tp_once,
                grid=(1,),
                in_specs=[pl.BlockSpec((R, L), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((L, R), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((L, R), jnp.int32),
            )(x[:R])
        ok = bool(jnp.all(got == x[:R].T))
        _record("ablate_micro2_transpose_exact", ok=ok)
    except Exception as e:  # lowering failure is a result too
        _record("ablate_micro2_transpose_exact", ok=False,
                error=str(e)[:200])

    for op in ("transpose2", "transpose_dot2", "roll_lane_s64",
               "roll_sub_s32"):
        kern = functools.partial(_micro2_kernel, op=op)

        def call(x):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(tiles,),
                    in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((R, L), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((tiles * R, L), jnp.int32),
                )(x)

        def fn(i, x):
            return jnp.sum(call(x + i)[0].astype(jnp.float64))

        try:
            per, times = m.timed(fn, (x,), inner=4)
        except Exception as e:
            _record(f"ablate_micro2_{op}", error=str(e)[:200])
            continue
        per_op_ns = per / tiles / K * 1e9
        _record(f"ablate_micro2_{op}", ms=round(per * 1e3, 2),
                ns_per_op_per_tile=round(per_op_ns, 1),
                times=[round(t, 3) for t in times])




def micro3():
    """Stack-height scaling of the lane roll — the v5/v6 design pivot:
    if a [S, 128] roll costs ~flat in S, stacking word planes (v5) and
    MULTIPLE TILES (v6 candidate) amortizes the dominant per-op cost."""
    m = M()
    for S in (64, 128, 384, 768, 1536):
        blocks = max(1, (512 * R) // S)
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 20, (blocks * S, L)),
            dtype=jnp.int32)

        def kern(x_ref, o_ref):
            def body(i, y):
                return pltpu.roll(y, 1, 1) + 1

            o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])

        def call(x, S=S, blocks=blocks):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(blocks,),
                    in_specs=[pl.BlockSpec((S, L), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((S, L), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((blocks * S, L),
                                                   jnp.int32),
                )(x)

        def fn(i, x):
            return jnp.sum(call(x + i)[0].astype(jnp.float64))

        try:
            per, times = m.timed(fn, (x,), inner=4)
        except Exception as e:
            _record(f"ablate_micro3_roll_S{S}", error=str(e)[:200])
            continue
        per_roll_ns = per / blocks / K * 1e9
        _record(f"ablate_micro3_roll_S{S}", ms=round(per * 1e3, 2),
                ns_per_roll=round(per_roll_ns, 1),
                ns_per_roll_per_64rows=round(per_roll_ns / (S / 64), 1),
                times=[round(t, 3) for t in times])


if __name__ == "__main__":
    for a in sys.argv[1:]:
        {"micro": micro, "stages": stages, "micro2": micro2,
         "micro3": micro3}[a]()
