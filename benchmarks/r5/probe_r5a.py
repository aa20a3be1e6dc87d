"""Round-5 flagship probes: the path below the v14 butterfly floor.

The r4 verdict: v14's pack+rotate butterfly (~2.4 ms of the 3.67 ms
flagship) is the family floor, and every costed alternative lands at or
above it. The floor, however, scales with the number of word planes W
moved through the butterfly (W*R stacked rows per roll). Round-5 plan:

  w6       control: compact_v14 kernel-only, 3 cols / 6 planes (r4
           measured 3.21 ms at 10M, sel 0.5)
  w4       projection pushdown: compute proj = v*2.0 + f BEFORE the
           filter (an XLA pre-pass; x64-correct rounding), compact only
           (key, proj) = 4 planes. Engine rationale: projection below
           filter is profitable exactly when it narrows the row (3 cols
           -> 2 cols); movement is the scarce resource on TPU, flops are
           free. Reference analogue: Gandiva fuses filter+project into
           one pass (cpp/src/gandiva/filter.h:66 + projector.h:41).
  prepass  the fused mask+proj+bases XLA pass feeding w4 (reads v/f
           planes once, emits mask + proj planes + per-step bases)
  int8     v14 routing dot in int8 (byte planes ARE bytes; v5e MXU int8
           runs 2x bf16): exactness vs the bf16 dot + timing
  dma      stream-copy floor: same grid/BlockSpec discipline, zero
           compute — the measured IO bound for the flagship's traffic
           (the "prove it's physics" denominator)

Writes benchmarks/r5/results_tpu_r5.json.
Usage: python benchmarks/r5/probe_r5a.py [job ...]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import arrow1_tpu  # noqa: E402,F401

L = 128
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")


def _record(name, **kv):
    try:
        with open(RESULTS) as f:
            res = json.load(f)
    except Exception:
        res = {}
    kv["at"] = time.strftime("%H:%M:%S")
    res[name] = kv
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(name, json.dumps(kv), flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _overhead():
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    return min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
               for _ in range(5))


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, 1 << 20, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.standard_normal(n)
    return key, v, f


def _planes64(x_i64):
    lo = (x_i64 & 0xFFFFFFFF).astype(np.int64).astype(np.uint32)
    hi = (x_i64 >> 32).astype(np.int64)
    return (jnp.asarray(lo.view(np.int32).copy()),
            jnp.asarray(hi.astype(np.int32)))


def _time_kernel(cols_planes, planes_meta, mask_np, n, R=256, band=152,
                 inner=8, reps=4, compact=None, lim=None):
    """Kernel-only flagship-style timing: mask is precomputed, the
    compact call + a slim consumer ride an INNER-deep fori_loop."""
    if compact is None:
        from arrow1_tpu.kernels.compaction_v14 import compact_v14
        compact = compact_v14
    mask = jnp.asarray(mask_np)
    if lim is None:
        lim = min(n, int(n * 0.5 * 1.05) + 16384)
        lim = (lim + 127) // 128 * 128

    @jax.jit
    def step(mask):
        def body(i, acc):
            m = mask ^ (i == -1)  # loop-variant dep, selectivity fixed
            outs, count = compact(m, cols_planes, rows=R, band=band,
                                  out_limit=lim, planes_meta=planes_meta)
            s = count.astype(jnp.float32)
            for o in outs:
                s = s + jnp.sum(o[:128].astype(jnp.float32))
                s = s + o[count - 1].astype(jnp.float32)
            return acc + s

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    overhead = _overhead()
    t0 = time.perf_counter()
    float(jax.device_get(step(mask)))
    compile_s = time.perf_counter() - t0
    times = [_t(lambda: float(jax.device_get(step(mask))))
             for _ in range(reps)]
    per = max(min(times) - overhead, 1e-9) / inner
    return per, compile_s, times


def op_w6(n=10_000_000):
    R = 256
    n = n // (R * L) * (R * L)
    key, v, f = _data(n)
    mask = (f > 0.0) & (v > 0)
    planes = (*_planes64(key), *_planes64(v),
              *_planes64(f.view(np.int64)))
    meta = ((2, ("64", jnp.int64)),) * 3
    per, compile_s, times = _time_kernel(planes, meta, mask, n)
    _record("r5_w6_kernel", ms=round(per * 1e3, 3),
            mrows_s=round(n / per / 1e6, 1),
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


def op_w4(n=10_000_000):
    R = 256
    n = n // (R * L) * (R * L)
    key, v, f = _data(n)
    mask = (f > 0.0) & (v > 0)
    proj = (v.astype(np.float64) * 2.0 + f).view(np.int64)
    planes = (*_planes64(key), *_planes64(proj))
    meta = ((2, ("64", jnp.int64)),) * 2
    per, compile_s, times = _time_kernel(planes, meta, mask, n)
    _record("r5_w4_kernel", ms=round(per * 1e3, 3),
            mrows_s=round(n / per / 1e6, 1),
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


def op_prepass(n=10_000_000):
    """The fused pass that feeds w4: read v/f planes, emit proj planes
    + mask (i32 [steps*R, L]) + per-step bases. One XLA dispatch."""
    R = 256
    n = n // (R * L) * (R * L)
    steps = n // (R * L)
    _, v, f = _data(n)
    vlo, vhi = _planes64(v)
    flo, fhi = _planes64(f.view(np.int64))

    @jax.jit
    def prepass(thresh, vthr, vlo, vhi, flo, fhi):
        v64 = ((vhi.astype(jnp.int64) << 32)
               | (vlo.astype(jnp.int64) & 0xFFFFFFFF))
        fb = ((fhi.astype(jnp.int64) << 32)
              | (flo.astype(jnp.int64) & 0xFFFFFFFF))
        f64 = jax.lax.bitcast_convert_type(fb, jnp.float64)
        mask = (f64 > thresh) & (v64 > vthr)
        proj = v64.astype(jnp.float64) * 2.0 + f64
        pb = jax.lax.bitcast_convert_type(proj, jnp.int64)
        plo = (pb & 0xFFFFFFFF).astype(jnp.int32)
        phi = (pb >> 32).astype(jnp.int32)
        m32 = mask.astype(jnp.int32)
        counts = jnp.sum(m32.reshape(steps, R * L), axis=1,
                         dtype=jnp.int32)
        bases = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(counts, dtype=jnp.int32)])
        return m32.reshape(-1, L), bases, plo, phi

    z = jnp.float64(0.0)
    zi = jnp.int64(0)
    args = (vlo, vhi, flo, fhi)
    out = prepass(z, zi, *args)
    jax.block_until_ready(out)
    overhead = _overhead()

    def run():
        jax.block_until_ready(prepass(z, zi, *args))

    times = [_t(run) for _ in range(6)]
    per = max(min(times) - overhead, 1e-9)
    _record("r5_prepass", ms=round(per * 1e3, 3),
            times=[round(t, 4) for t in sorted(times)])


# ---------------------------------------------------------------------
# int8 routing dot variant of the v14 kernel
# ---------------------------------------------------------------------

_DN_ROUTE = (((1,), (1,)), ((0,), (0,)))


def _v14i8_kernel(bases_ref, mask_ref, *refs, nwords, steps, rows, band):
    from arrow1_tpu.kernels.butterfly import _SEL, _pack_rotate_stacked
    R, W, RP = rows, nwords, band
    DP = dict(preferred_element_type=jnp.float32)
    ins = refs[:W]
    out = refs[W]
    stage = refs[W + 1]
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

    mA = ((lane >= rot) & (lane < rot + cnt_col)).astype(jnp.int32)
    mB = (lane < rot + cnt_col - L).astype(jnp.int32)
    stk3 = stk.reshape(W, R, L)
    a3 = stk3 * mA[None]
    b3 = stk3 * mB[None]
    # int8 byte planes: 0..255 wraps to signed; (X & 0xFF) at reassembly
    # recovers the unsigned byte (each output lane receives exactly one
    # contribution — disjoint-lane addition)
    pa = jnp.concatenate(
        [((a3 >> sh) & 0xFF).astype(jnp.int8)
         for sh in (0, 8, 16, 24)], axis=2)
    pb = jnp.concatenate(
        [((b3 >> sh) & 0xFF).astype(jnp.int8)
         for sh in (0, 8, 16, 24)], axis=2)
    pab = jnp.concatenate([pa, pb], axis=1)

    qi = jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
    ohA = (qi == q_rel).astype(jnp.int8)
    ohB = (qi == q_rel + 1).astype(jnp.int8)
    OH = jnp.concatenate([ohA, ohB], axis=0)
    OH3 = jnp.concatenate([OH[None]] * W, axis=0)
    X = jax.lax.dot_general(OH3, pab, _DN_ROUTE,
                            preferred_element_type=jnp.int32)
    out_i = ((X[:, :, 0 * L:1 * L] & 0xFF)
             | ((X[:, :, 1 * L:2 * L] & 0xFF) << 8)
             | ((X[:, :, 2 * L:3 * L] & 0xFF) << 16)
             | (X[:, :, 3 * L:4 * L] << 24))

    rio = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 0)
    laneRP = jax.lax.broadcasted_iota(jnp.int32, (RP, L), 1)
    bnd0 = base % L
    out_i = jnp.where((rio[None] == 0) & (laneRP[None] < bnd0),
                      carry[:, 0:1, :], out_i)
    r_last = base_n // L - q0
    carry[:, 0:1, :] = jnp.sum(
        out_i * (rio[None] == r_last), axis=1, keepdims=True)

    slot = step % 2
    stage[slot] = out_i

    def _dma(s, q):
        return pltpu.make_async_copy(
            stage.at[s % 2], out.at[:, pl.ds(q, RP), :], sems.at[s % 2])

    @pl.when(step >= 1)
    def _():
        _dma(step - 1, bases_ref[step - 1] // L).wait()

    _dma(step, q0).start()

    @pl.when(step == steps - 1)
    def _():
        _dma(step, q0).wait()


@functools.partial(
    jax.jit, static_argnames=("rows", "band", "out_limit", "planes_meta"))
def compact_v14i8(mask, cols, rows=256, band=152, out_limit=None,
                  planes_meta=None):
    from arrow1_tpu.kernels.compaction_v4 import _from_words, _prep_words
    R = rows
    n = mask.shape[0]
    steps = n // (R * L)
    m32 = mask.astype(jnp.int32)
    counts = jnp.sum(m32.reshape(steps, R * L), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    count = bases[-1]
    words, col_meta = _prep_words(cols, planes_meta)
    nwords = len(words)
    m2 = m32.reshape(-1, L)
    out_rows = n // L + band
    kernel = functools.partial(_v14i8_kernel, nwords=nwords, steps=steps,
                               rows=R, band=band)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(steps,),
        in_specs=[pl.BlockSpec((R, L), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + nwords),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nwords, band, L), jnp.int32),
            pltpu.VMEM((nwords, 8, L), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    with jax.enable_x64(False):
        out3d = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nwords, out_rows, L),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
        )(bases, m2, *words)
    back = []
    pos = 0
    for nw, meta in col_meta:
        outs_i = [out3d[pos + j].reshape(-1)[:out_limit]
                  for j in range(nw)]
        back.append(_from_words(outs_i, meta))
        pos += nw
    return tuple(back), count


def op_int8(n=10_000_000):
    from arrow1_tpu.kernels.compaction_v14 import compact_v14
    R = 256
    n = n // (R * L) * (R * L)
    key, v, f = _data(n)
    mask_np = (f > 0.0) & (v > 0)
    planes = (*_planes64(key), *_planes64(v),
              *_planes64(f.view(np.int64)))
    meta = ((2, ("64", jnp.int64)),) * 3
    lim = (int(n * 0.5 * 1.05) + 16384 + 127) // 128 * 128

    # exactness first (the v13 lesson): int8 vs bf16 on a 2-step slice
    ns = R * L * 4
    mask_s = jnp.asarray(mask_np[:ns])
    planes_s = tuple(p[:ns] for p in planes)
    ref_outs, ref_cnt = compact_v14(mask_s, planes_s, rows=R, band=152,
                                    out_limit=None, planes_meta=meta)
    got_outs, got_cnt = compact_v14i8(mask_s, planes_s, rows=R, band=152,
                                      out_limit=None, planes_meta=meta)
    cnt = int(jax.device_get(ref_cnt))
    exact = int(jax.device_get(got_cnt)) == cnt and all(
        bool(jax.device_get(
            jnp.all(a[:cnt] == b[:cnt])))
        for a, b in zip(ref_outs, got_outs))
    if not exact:
        _record("r5_int8_kernel", exact=False)
        return
    per, compile_s, times = _time_kernel(
        planes, meta, mask_np, n, compact=compact_v14i8, lim=lim)
    _record("r5_int8_kernel", exact=True, ms=round(per * 1e3, 3),
            mrows_s=round(n / per / 1e6, 1),
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


# ---------------------------------------------------------------------
# DMA stream-copy floor
# ---------------------------------------------------------------------

def _dma_kernel(*refs, nwords, band):
    W, RP = nwords, band
    ins = refs[:W]
    out = refs[W]
    out[...] = jnp.concatenate(
        [r[:RP, :][jnp.newaxis] for r in ins], axis=0)


def op_dma(n=10_000_000, W=6, RP=152):
    """Read W full planes, write back band rows per step — the
    flagship's exact HBM traffic with zero compute."""
    R = 256
    n = n // (R * L) * (R * L)
    steps = n // (R * L)
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(
        rng.integers(-(1 << 31), 1 << 31, n).astype(np.int64)
        .astype(np.int32)).reshape(-1, L) for _ in range(W)]
    kernel = functools.partial(_dma_kernel, nwords=W, band=RP)

    call = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * W,
        out_specs=pl.BlockSpec((W, RP, L), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, steps * RP, L), jnp.int32),
    )

    @jax.jit
    def step(planes):
        def body(i, acc):
            ps = [p ^ (i == -1) for p in planes]
            with jax.enable_x64(False):
                o = call(*ps)
            return acc + o[0, 0, 0] + o[W - 1, -1, -1]

        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    overhead = _overhead()
    t0 = time.perf_counter()
    int(jax.device_get(step(planes)))
    compile_s = time.perf_counter() - t0
    times = [_t(lambda: int(jax.device_get(step(planes))))
             for _ in range(4)]
    per = max(min(times) - overhead, 1e-9) / 8
    rd = n * 4 * W
    wr = steps * RP * L * 4 * W
    _record(f"r5_dma_floor_w{W}", ms=round(per * 1e3, 3),
            gb_s=round((rd + wr) / per / 1e9, 1),
            read_mb=rd // 2**20, write_mb=wr // 2**20,
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


JOBS = {"w6": op_w6, "w4": op_w4, "prepass": op_prepass,
        "int8": op_int8, "dma": op_dma}

if __name__ == "__main__":
    for job in (sys.argv[1:] or ["dma", "w4", "prepass", "int8", "w6"]):
        JOBS[job]()
