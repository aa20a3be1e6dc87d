"""v14 stage ablation on TPU: where do the milliseconds go?

Stages: pack (butterfly+IO), planes (+byte split/merge), full (+ the
single banded one-hot routing dot + carry). Word planes come from the
arithmetic _to_words (no bitcast relayout).

Variants cut the kernel pipeline after successive stages (same input
DMA, same output DMA window discipline) so stage cost = delta between
consecutive rows. Results are timing-only (truncated stages produce
wrong output by design). Writes/updates benchmarks/r4/results_tpu_r4.json.

Usage: python benchmarks/r4/v14_ablate.py [stage ...]
  stages: pack planes full
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import arrow1_tpu  # noqa: E402,F401
from arrow1_tpu.kernels.butterfly import (_SEL,  # noqa: E402
                                          _pack_rotate_stacked)

L = 128
DP = dict(preferred_element_type=jnp.float32)
_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))
_DN_BND = (((0,), (0,)), ((), ()))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r4.json")


def _kernel(bases_ref, mask_ref, *refs, nwords, steps, rows, band, stage):
    R, W, RP = rows, nwords, band
    ins = refs[:W]
    out = refs[W]
    stg = refs[W + 1]
    carry = refs[W + 2]
    sems = refs[W + 3]
    step = pl.program_id(0)
    base = bases_ref[step]
    base_n = bases_ref[step + 1]
    q0 = base // L

    @pl.when(step == 0)
    def _():
        carry[:] = jnp.zeros((W, 8, L), jnp.int32)

    m = mask_ref[:]
    mf = m.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    incl = jnp.dot(mf, (ci <= cj).astype(jnp.float32), **DP
                   ).astype(jnp.int32)
    cnt_col = jnp.dot(mf, jnp.ones((L, 1), jnp.float32), **DP
                      ).astype(jnp.int32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    excl_row = jnp.dot((rj < ri).astype(jnp.float32),
                       cnt_col.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)
    S_all = excl_row + base % L
    rot = S_all % L
    q_rel = S_all // L
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    dist = jnp.where(m != 0, lane + 1 - incl, 0)
    aux = dist | (m * _SEL)

    stk = jnp.concatenate([r_[:] for r_ in ins], axis=0)
    stk = _pack_rotate_stacked(stk, aux, rot, W)
    stk3 = stk.reshape(W, R, L)

    if stage == "pack":
        out_i = stk3[:, :RP, :] if RP <= R else jnp.concatenate(
            [stk3, jnp.zeros((W, RP - R, L), jnp.int32)], axis=1)
    else:
        mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
        mB = (lane < rot + cnt_col - L).astype(jnp.int32)
        a3 = stk3 * mA[None]
        b3 = stk3 * mB[None]
        pa = jnp.concatenate(
            [((a3 >> sh) & 0xFF).astype(jnp.bfloat16)
             for sh in (0, 8, 16, 24)], axis=2)
        pb = jnp.concatenate(
            [((b3 >> sh) & 0xFF).astype(jnp.bfloat16)
             for sh in (0, 8, 16, 24)], axis=2)
        if stage == "planes":
            pq = (pa + pb)[:, :RP, :] if RP <= R else jnp.concatenate(
                [pa + pb, jnp.zeros((W, RP - R, 4 * L), jnp.bfloat16)],
                axis=1)
            out_i = (pq[:, :, 0:L].astype(jnp.int32)
                     | (pq[:, :, L:2 * L].astype(jnp.int32) << 8)
                     | (pq[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
                     | (pq[:, :, 3 * L:4 * L].astype(jnp.int32) << 24))
        else:  # full: the v14 one-dot routing
            pab = jnp.concatenate([pa, pb], axis=1)
            qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
            ohA = (qi == q_rel).astype(jnp.bfloat16)
            ohB = (qi == q_rel + 1).astype(jnp.bfloat16)
            OH = jnp.concatenate([ohA, ohB], axis=0)
            OH3 = jnp.concatenate([OH[None]] * W, axis=0)
            X = jax.lax.dot_general(OH3, pab, _DN_ROUTE, **DP)
            out_i = (X[:, :, 0:L].astype(jnp.int32)
                     | (X[:, :, L:2 * L].astype(jnp.int32) << 8)
                     | (X[:, :, 2 * L:3 * L].astype(jnp.int32) << 16)
                     | (X[:, :, 3 * L:4 * L].astype(jnp.int32) << 24))
            rio = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 0)
            laneRP = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 1)
            out_i = jnp.where((rio[None] == 0) & (laneRP[None]
                                                  < base % L),
                              carry[:, 0:1, :], out_i)
            r_last = base_n // L - q0
            carry[:, 0:1, :] = jnp.sum(
                out_i * (rio[None] == r_last), axis=1, keepdims=True)

    slot = step % 2
    stg[slot] = out_i

    def _dma(s, q):
        return pltpu.make_async_copy(
            stg.at[s % 2], out.at[:, pl.ds(q, RP), :], sems.at[s % 2])

    @pl.when(step >= 1)
    def _():
        _dma(step - 1, bases_ref[step - 1] // L).wait()

    _dma(step, q0).start()

    @pl.when(step == steps - 1)
    def _():
        _dma(step, q0).wait()


def run_variant(name, stage, N, R, RP, reps=4, inner=8):
    rng = np.random.default_rng(0)
    n = N // (R * L * 16) * (R * L * 16)
    key = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int64))
    v = jnp.asarray(
        rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    maskH = rng.random(n) < 0.5
    mask = jnp.asarray(maskH)

    from arrow1_tpu.kernels.compaction_v4 import _to_words
    steps = n // (R * L)

    def build(m32):
        counts = jnp.sum(m32.reshape(steps, R * L), axis=1,
                         dtype=jnp.int32)
        bases = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(counts, dtype=jnp.int32)])
        words = []
        for c in (key, v, fb):
            ws, _ = _to_words(c)
            words.extend(w.reshape(-1, L) for w in ws)
        return bases, m32.reshape(-1, L), words

    W = 6
    out_rows = n // L + max(RP, R + 9)
    kernel = functools.partial(_kernel, nwords=W, steps=steps, rows=R,
                               band=RP, stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(steps,),
        in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, W, RP, L), jnp.int32),
            pltpu.VMEM((W, 8, L), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    @jax.jit
    def step_fn(m_in):
        def body(i, acc):
            m32 = m_in.astype(jnp.int32) ^ (i - i)  # loop-variant dep
            bases, m2, words = build(m32)
            with jax.enable_x64(False):
                o = pl.pallas_call(
                    kernel, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((W, out_rows, L),
                                                   jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True,
                        vmem_limit_bytes=110 * 1024 * 1024),
                )(bases, m2, *words)
            return acc + o[0, 0, 0] + o[W - 1, out_rows - 1, 0]

        return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    overhead = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
                   for _ in range(5))
    t0 = time.perf_counter()
    int(jax.device_get(step_fn(mask)))
    compile_s = time.perf_counter() - t0
    times = [_t(lambda: int(jax.device_get(step_fn(mask))))
             for _ in range(reps)]
    per = max(min(times) - overhead, 1e-9) / inner
    row = {"ms": round(per * 1e3, 3),
           "mrows_s": round(n / per / 1e6, 1),
           "compile_s": round(compile_s, 1),
           "times": [round(t, 3) for t in sorted(times)],
           "at": time.strftime("%H:%M:%S")}
    print(name, json.dumps(row), flush=True)
    try:
        with open(RESULTS) as f:
            res = json.load(f)
    except Exception:
        res = {}
    res[name] = row
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    N = 10_000_000
    stages = sys.argv[1:] or ["pack", "planes", "full"]
    for s in stages:
        R = 256
        RP = 152
        run_variant(f"v14ab_{s}_r{R}b{RP}", s, N, R, RP)
