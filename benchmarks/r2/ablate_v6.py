"""v6 compaction stage ablation (flagship shape: 3 cols / 6 words, T=8).

Splits the v6t8 kernel's per-step cost into cumulative stages so the
next optimization targets the dominant one:
  stage 1: prefix dots only (incl/cnt/excl_row over the [H, H] block)
  stage 2: + stacked butterfly (14 rolls over [W*T*R, L])
  stage 3: + per-row output rotation
  stage 4: + per-tile MXU merge math (union + byte-plane dots, no acc)
  stage 5: + accumulator carry writes (no DMA ring)
  stage 0: full production compact_v6 (t_tiles=8)

Usage: python benchmarks/r2/ablate_v6.py
Results land in results_tpu_r2.json as ablate_v6_stage{K}.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from arrow1_tpu.kernels.compaction_v4 import _to_words  # noqa: E402
from arrow1_tpu.kernels.compaction_v6 import (  # noqa: E402
    _pack_rotate_stacked, _SEL, DP, compact_v6)
from measure_r2 import M, _record  # noqa: E402

L = 128
R = 64
T = 8


def _staged_kernel(mask_ref, *refs, nwords: int, stage: int):
    H = T * R
    ins = refs[:nwords]
    outs = refs[nwords:]

    m = mask_ref[:]
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triU = (ci <= cj).astype(jnp.float32)
    incl = jnp.dot(mf, triU, **DP).astype(jnp.int32)
    ones_col = jnp.ones((L, 1), jnp.float32)
    cnt_col = jnp.dot(mf, ones_col, **DP).astype(jnp.int32)
    rHi = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    cHi = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    triB = ((cHi < rHi) & (cHi // R == rHi // R)).astype(jnp.float32)
    excl_row = jnp.dot(triB, cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)
    S_all = excl_row  # rem=0 stand-in, same op count
    rot = S_all % L

    if stage == 1:
        probe = incl + dist + rot
        for wi in range(nwords):
            outs[wi][:] = probe
        return

    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)
    stk = _pack_rotate_stacked(
        stk, aux, rot if stage >= 3 else jnp.zeros_like(rot), nwords)
    if stage in (2, 3):
        for wi in range(nwords):
            outs[wi][:] = stk[wi * H:(wi + 1) * H]
        return

    laneR = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    iota_acc = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)
    dnT = (((0,), (0,)), ((), ()))
    sinks = [[] for _ in range(nwords)]
    for j in range(T):
        S = S_all[j * R:(j + 1) * R]
        cnt = cnt_col[j * R:(j + 1) * R]
        rotj = rot[j * R:(j + 1) * R]
        q = S // L
        ohT = (iota_acc == q).astype(jnp.float32)
        ohT1 = (iota_acc == q + 1).astype(jnp.float32)
        mA = ((laneR >= rotj) & (laneR < rotj + cnt)).astype(jnp.int32)
        mB = (laneR < rotj + cnt - L).astype(jnp.int32)
        oh2 = jnp.concatenate([ohT, ohT1], axis=0)
        m2f = jnp.concatenate([mA, mB], axis=0).astype(jnp.float32)
        union = jax.lax.dot_general(oh2, m2f, dnT, **DP)
        covered = union > 0.5

        for wi in range(nwords):
            v = stk[(wi * T + j) * R:(wi * T + j + 1) * R]
            v2 = jnp.concatenate([v * mA, v * mB], axis=0)
            planes = jnp.concatenate(
                [((v2 >> shift) & 0xFF).astype(jnp.float32)
                 for shift in (0, 8, 16, 24)], axis=1)
            p4 = jax.lax.dot_general(oh2, planes, dnT, **DP)
            contrib = (p4[:, 0 * L:1 * L].astype(jnp.int32)
                       | (p4[:, 1 * L:2 * L].astype(jnp.int32) << 8)
                       | (p4[:, 2 * L:3 * L].astype(jnp.int32) << 16)
                       | (p4[:, 3 * L:4 * L].astype(jnp.int32) << 24))
            sinks[wi].append(jnp.where(covered, contrib, 0)[:R])

    # stage >= 4: emit the per-tile merge results (no cross-tile acc ring)
    for wi in range(nwords):
        outs[wi][:] = jnp.concatenate(sinks[wi], axis=0)


def call_staged(mask, cols, stage, tiles):
    steps = tiles // T
    words = []
    for c in cols:
        ws, _ = _to_words(c)
        words.extend(w.reshape(-1, L) for w in ws)
    nwords = len(words)
    m2 = mask.astype(jnp.int32).reshape(-1, L)
    kern = functools.partial(_staged_kernel, nwords=nwords, stage=stage)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[pl.BlockSpec((T * R, L), lambda i: (i, 0))] * (
                1 + nwords),
            out_specs=[pl.BlockSpec((T * R, L), lambda i: (i, 0))] * nwords,
            out_shape=[jax.ShapeDtypeStruct((steps * T * R, L), jnp.int32)
                       ] * nwords,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=bool(os.environ.get("A1T_ABL_INTERPRET")),
        )(m2, *words)
    return outs


def main():
    m = M()
    rng = np.random.default_rng(7)
    TILE = R * L
    n = (10_000_000 // (T * TILE)) * (T * TILE)
    tiles = n // TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))

    for stage in (1, 2, 3, 4, 0):
        def fn(i, key, v, fb, stage=stage):
            f = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (f > i.astype(jnp.float64) * 1e-12) & (v > jnp.int64(0))
            if stage == 0:
                (ok, ov, ofb), count = compact_v6(
                    mask, (key, v, fb), rows=R, t_tiles=T)
                return (count.astype(jnp.float64) +
                        jnp.sum(ok).astype(jnp.float64))
            outs = call_staged(mask, (key, v, fb), stage, tiles)
            return sum(jnp.sum(o).astype(jnp.float64) for o in outs[:2])

        per, times = m.timed(fn, (key, v, fb), inner=4)
        _record(f"ablate_v6_stage{stage}", n=n, ms=round(per * 1e3, 2),
                us_per_step=round(per / (tiles // T) * 1e6, 2),
                mrows_s=round(n / per / 1e6, 1),
                times=[round(x, 3) for x in times])


if __name__ == "__main__":
    main()
