"""Round-5 flagship probes, part B: the f32x2 projection split.

probe_r5a found: the W=4 kernel runs 1.654 ms (vs 3.21 at W=6) but the
f64 -> i64 bitcast needed to make proj bit-planes does not lower on this
toolchain (x64 rewriting: "bitcast_convert_type s64 ... not
implemented"). On TPU, however, f64 IS physically a float-float pair
(the x64 rewriting stores f64 as hi/lo f32) — so the exact split is
  hi = f32(x); lo = f32(x - f64(hi))
and the exact recombine is f64(hi) + f64(lo), no bitcasts anywhere.
This is exact ON THIS PLATFORM by construction (the split/recombine are
identities in float-float arithmetic); real-f64 backends (CPU tests)
keep the plain path.

  ddsplit   roundtrip exactness of the split/recombine on device
            (random normals, wide exponents, negatives, zeros)
  prepass2  fused mask + proj + f32x2 split + per-step bases (XLA)
  fusedA    END-TO-END flagship candidate: prepass2 + compact_v14 on
            (key i64, proj f32x2) = 4 planes + slim consumer, one jit

Writes benchmarks/r5/results_tpu_r5.json.
Usage: python benchmarks/r5/probe_r5b.py [job ...]
"""

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


def _planes64_np(x_i64):
    lo = (x_i64 & 0xFFFFFFFF).astype(np.int64).astype(np.uint32)
    hi = (x_i64 >> 32).astype(np.int64)
    return (jnp.asarray(lo.view(np.int32).copy()),
            jnp.asarray(hi.astype(np.int32)))


def dd_split(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def dd_join(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def op_ddsplit():
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.standard_normal(1 << 16),
        rng.standard_normal(1 << 14) * 10.0 ** rng.integers(
            -30, 30, 1 << 14),
        np.array([0.0, -0.0, 1e-300, -1e300, 2.0 ** -1000, np.pi]),
    ])
    x = jnp.asarray(xs)

    @jax.jit
    def f(x):
        hi, lo = dd_split(x)
        y = dd_join(hi, lo)
        return jnp.sum((y != x).astype(jnp.int32)), jnp.sum(
            (y - x == 0.0).astype(jnp.int32))

    neq, eq0 = jax.device_get(f(x))
    _record("r5_ddsplit", n=int(x.shape[0]), mismatches=int(neq),
            exact_diffs=int(eq0))


def _prepass2(thresh, vthr, vlo, vhi, flo, fhi, steps, R):
    v64 = ((vhi.astype(jnp.int64) << 32)
           | (vlo.astype(jnp.int64) & 0xFFFFFFFF))
    fb = ((fhi.astype(jnp.int64) << 32)
          | (flo.astype(jnp.int64) & 0xFFFFFFFF))
    f64 = jax.lax.bitcast_convert_type(fb, jnp.float64)
    mask = (f64 > thresh) & (v64 > vthr)
    proj = v64.astype(jnp.float64) * 2.0 + f64
    phi, plo = dd_split(proj)
    m32 = mask.astype(jnp.int32)
    counts = jnp.sum(m32.reshape(steps, R * L), axis=1, dtype=jnp.int32)
    bases = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(counts, dtype=jnp.int32)])
    return m32, bases, phi, plo


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, 1 << 20, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.standard_normal(n)
    return key, v, f


def op_prepass2(n=10_000_000):
    R = 256
    n = n // (R * L) * (R * L)
    steps = n // (R * L)
    _, v, f = _data(n)
    vlo, vhi = _planes64_np(v)
    flo, fhi = _planes64_np(f.view(np.int64))

    fn = jax.jit(lambda t, vt, a, b, c, d: _prepass2(
        t, vt, a, b, c, d, steps, R))
    z, zi = jnp.float64(0.0), jnp.int64(0)
    args = (vlo, vhi, flo, fhi)
    out = fn(z, zi, *args)
    jax.block_until_ready(out)
    overhead = _overhead()

    def run():
        jax.block_until_ready(fn(z, zi, *args))

    times = [_t(run) for _ in range(6)]
    per = max(min(times) - overhead, 1e-9)
    _record("r5_prepass2", ms=round(per * 1e3, 3),
            times=[round(t, 4) for t in sorted(times)])


def op_fusedA(n=10_000_000, sel=0.5, dot="bf16", tag="r5_fusedA"):
    """End-to-end flagship candidate in one jit: prepass2 -> v14 on
    4 planes (key i64 + proj f32x2) -> slim consumer."""
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    R, BAND = 256, 152
    n = n // (R * L) * (R * L)
    steps = n // (R * L)
    key, v, f = _data(n)
    klo, khi = _planes64_np(key)
    vlo, vhi = _planes64_np(v)
    flo, fhi = _planes64_np(f.view(np.int64))
    LIM = (int(n * sel * 1.05) + 16384 + 127) // 128 * 128
    meta = ((2, ("64", jnp.int64)), (1, ("f32", jnp.float32)),
            (1, ("f32", jnp.float32)))
    vthr = jnp.int64(int((1.0 - 2.0 * min(2.0 * sel, 1.0)) * (1 << 30)))

    def one(thresh, klo, khi, vlo, vhi, flo, fhi):
        m32, bases, phi, plo = _prepass2(thresh, vthr, vlo, vhi, flo,
                                         fhi, steps, R)
        phw = jax.lax.bitcast_convert_type(phi, jnp.int32)
        plw = jax.lax.bitcast_convert_type(plo, jnp.int32)
        (out_key, out_ph, out_pl), count = compact_v14(
            m32 != 0, (klo, khi, phw, plw), rows=R, band=BAND,
            out_limit=LIM, planes_meta=meta, dot=dot)
        proj = dd_join(out_ph, out_pl)
        return (count.astype(jnp.float64)
                + jnp.sum(out_key[:1024]).astype(jnp.float64)
                + jnp.sum(proj)
                + out_key[count - 1].astype(jnp.float64))

    INNER = 8

    @jax.jit
    def step(thresh, *planes):
        def body(i, acc):
            return acc + one(thresh + i.astype(jnp.float64) * 1e-12,
                             *planes)

        return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    planes = (klo, khi, vlo, vhi, flo, fhi)
    z = jnp.float64(0.0)
    overhead = _overhead()
    t0 = time.perf_counter()
    got = float(jax.device_get(step(z, *planes)))
    compile_s = time.perf_counter() - t0

    # exactness: against the same pipeline on host numpy (the first
    # r5_fusedA record used v > 0 here — vthr at SEL=0.5 is -2^30, so
    # its rel_err=0.9999 was the ORACLE's bug, not the kernel's)
    maskH = (f > 0.0) & (v > int(jax.device_get(vthr)))
    cnt = int(maskH.sum())
    projH = v.astype(np.float64) * 2.0 + f
    expect = (float(cnt) + float(key[maskH][:1024].sum())
              + float(projH[maskH].sum()) + float(key[maskH][-1]))
    rel = abs(got / INNER - expect) / max(abs(expect), 1.0)

    times = [_t(lambda: float(jax.device_get(step(z, *planes))))
             for _ in range(5)]
    per = max(min(times) - overhead, 1e-9) / INNER
    selm = cnt / n
    bytes_per_row = 24 + 16 * selm
    from arrow1_tpu.profiler import hbm_peak_bytes_per_sec

    peak = hbm_peak_bytes_per_sec(jax.devices()[0])
    vsb = n / per * bytes_per_row / (0.80 * peak)
    _record(tag, ms=round(per * 1e3, 3),
            grows_s=round(n / per / 1e9, 2),
            vs_baseline=round(vsb, 4), rel_err=float(rel),
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


def op_fusedB():
    op_fusedA(dot="i8", tag="r5_fusedB_i8")


JOBS = {"ddsplit": op_ddsplit, "prepass2": op_prepass2,
        "fusedA": op_fusedA, "fusedB": op_fusedB}



def op_i8diag(n=10_000_000):
    """fusedB returned a NaN checksum on TPU while interpret mode is
    bit-identical — localize: run the fused one() with bf16 and i8
    dots on the SAME inputs, compare outputs elementwise on device."""
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    R, BAND = 256, 152
    n = n // (R * L) * (R * L)
    steps = n // (R * L)
    key, v, f = _data(n)
    klo, khi = _planes64_np(key)
    vlo, vhi = _planes64_np(v)
    flo, fhi = _planes64_np(f.view(np.int64))
    LIM = (int(n * 0.5 * 1.05) + 16384 + 127) // 128 * 128
    meta = ((2, ("64", jnp.int64)), (1, ("f32", jnp.float32)),
            (1, ("f32", jnp.float32)))
    vthr = jnp.int64(-(1 << 30))

    @jax.jit
    def both(thresh, vlo, vhi, flo, fhi, klo, khi):
        m32, bases, phi, plo = _prepass2(thresh, vthr, vlo, vhi, flo,
                                         fhi, steps, R)
        phw = jax.lax.bitcast_convert_type(phi, jnp.int32)
        plw = jax.lax.bitcast_convert_type(plo, jnp.int32)
        outs = {}
        for dot in ("bf16", "i8"):
            (ok, op, ol), cnt = compact_v14(
                m32 != 0, (klo, khi, phw, plw), rows=R, band=BAND,
                out_limit=LIM, planes_meta=meta, dot=dot)
            outs[dot] = (ok, jax.lax.bitcast_convert_type(op, jnp.int32),
                         jax.lax.bitcast_convert_type(ol, jnp.int32),
                         cnt)
        a, b = outs["bf16"], outs["i8"]
        cnt = a[3]
        idx = jnp.arange(LIM)
        live = idx < cnt
        diffs = [jnp.sum((x != y) & live) for x, y in
                 zip(a[:3], b[:3])]
        first_bad = [jnp.argmax((x != y) & live) for x, y in
                     zip(a[:3], b[:3])]
        badvals = [(x[i], y[i]) for (x, y), i in
                   zip(zip(a[:3], b[:3]), first_bad)]
        return (cnt, b[3], diffs, first_bad, badvals)

    z = jnp.float64(0.0)
    got = jax.device_get(both(z, vlo, vhi, flo, fhi, klo, khi))
    cnt, cnt_i8, diffs, first_bad, badvals = got
    _record("r5_i8diag", count_bf16=int(cnt), count_i8=int(cnt_i8),
            diffs=[int(d) for d in diffs],
            first_bad=[int(i) for i in first_bad],
            badvals=[[int(x), int(y)] for x, y in badvals])


JOBS["i8diag"] = op_i8diag


if __name__ == "__main__":
    for job in (sys.argv[1:] or ["ddsplit", "prepass2", "fusedA"]):
        JOBS[job]()
