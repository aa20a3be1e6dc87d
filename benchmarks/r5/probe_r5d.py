"""Round-5 probe D: compact_fused (v15) on-device.

v15 moves the predicate + projection INSIDE the kernel (no prepass
round-trip, no mask plane, no bases prefetch — base carried in SMEM).
Expected from the cost model: fusedA(i8) minus ~0.35 ms of prepass HBM
round-trip. Jobs:

  v15       flagship closure at 10M, sel 0.5: timing + count parity +
            checksum vs the host float-float oracle
  v15sel    selectivity grid (0.1 / 0.9) — band sizing + banded-skip
            behavior under the same kernel

Writes benchmarks/r5/results_tpu_r5.json.
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


def _i32(v):
    return int(np.uint32(v & 0xFFFFFFFF).astype(np.int32))


def op_v15(n=10_000_000, sel=0.5, tag="r5_v15", split=1):
    from arrow1_tpu.kernels.compaction_v15 import compact_fused
    from arrow1_tpu.kernels.fused_ops import flagship_filter_project
    from arrow1_tpu.kernels.dd import np_dd_split

    R = 256
    n = n // (R * L) * (R * L)
    rng = np.random.default_rng(0)
    key = rng.integers(0, 1 << 20, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    f = rng.standard_normal(n)
    fh, fl = np_dd_split(f)
    planes = tuple(jnp.asarray(x) for x in (
        (key & 0xFFFFFFFF).astype(np.uint32).view(np.int32).copy(),
        (key >> 32).astype(np.int32),
        (v & 0xFFFFFFFF).astype(np.uint32).view(np.int32).copy(),
        (v >> 32).astype(np.int32),
        fh.view(np.int32).copy(), fl.view(np.int32).copy()))
    vthr = int((1.0 - 2.0 * min(2.0 * sel, 1.0)) * (1 << 30))
    BAND = min(R + 9, int(R * sel) + 24)
    LIM = (int(n * sel * 1.05) + 16384 + 127) // 128 * 128

    def params_of(thresh):
        th = thresh.astype(jnp.float32)
        tl = (thresh - th.astype(jnp.float64)).astype(jnp.float32)
        return jnp.stack([
            jnp.int32(_i32(vthr)),
            jnp.int32(_i32(vthr >> 32)),
            jax.lax.bitcast_convert_type(th, jnp.int32),
            jax.lax.bitcast_convert_type(tl, jnp.int32),
            jnp.int32(0), jnp.int32(0)])

    def one(thresh, planes):
        (oklo, okhi, oph, opl), count, ovf = compact_fused(
            planes, flagship_filter_project, 4,
            params=params_of(thresh), rows=R, band=BAND, out_limit=LIM,
            split=split)
        okey = ((okhi.astype(jnp.int64) << 32)
                | (oklo.astype(jnp.int64) & 0xFFFFFFFF))
        proj = (jax.lax.bitcast_convert_type(oph, jnp.float32)
                .astype(jnp.float64)
                + jax.lax.bitcast_convert_type(opl, jnp.float32)
                .astype(jnp.float64))
        return (count.astype(jnp.float64)
                + ovf.astype(jnp.float64) * 1e30
                + jnp.sum(okey[:1024]).astype(jnp.float64)
                + jnp.sum(proj)
                + okey[count - 1].astype(jnp.float64))

    INNER = 8

    @jax.jit
    def step(thresh, planes):
        def body(i, acc):
            return acc + one(thresh + i.astype(jnp.float64) * 1e-12,
                             planes)

        return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    z = jnp.float64(0.0)
    overhead = _overhead()
    t0 = time.perf_counter()
    got = float(jax.device_get(step(z, planes)))
    compile_s = time.perf_counter() - t0

    maskH = ((fh.astype(np.float64) + fl.astype(np.float64)) > 0.0) \
        & (v > vthr)
    cnt = int(maskH.sum())
    projH = (fh.astype(np.float64) + fl.astype(np.float64)
             + 2.0 * v.astype(np.float64))
    expect = (float(cnt) + float(key[maskH][:1024].sum())
              + float(projH[maskH].sum()) + float(key[maskH][-1]))
    rel = abs(got / INNER - expect) / max(abs(expect), 1.0)

    times = [_t(lambda: float(jax.device_get(step(z, planes))))
             for _ in range(5)]
    per = max(min(times) - overhead, 1e-9) / INNER
    selm = cnt / n
    from arrow1_tpu.profiler import hbm_peak_bytes_per_sec

    peak = hbm_peak_bytes_per_sec(jax.devices()[0])
    vsb = n / per * (24 + 16 * selm) / (0.80 * peak)
    _record(tag, ms=round(per * 1e3, 3),
            grows_s=round(n / per / 1e9, 2),
            vs_baseline=round(vsb, 4), rel_err=float(rel),
            sel=round(selm, 4),
            compile_s=round(compile_s, 1),
            times=[round(t, 3) for t in sorted(times)])


def op_v15sel():
    # the bench's compound predicate reaches sel <= 0.5 (f-factor 0.5);
    # the low-band leg shows the banded dot shrinking with selectivity
    op_v15(sel=0.1, tag="r5_v15_sel10")
    op_v15(sel=0.25, tag="r5_v15_sel25")


def op_v15split():
    op_v15(split=2, tag="r5_v15_split2")


JOBS = {"v15": op_v15, "v15sel": op_v15sel, "v15split": op_v15split}

if __name__ == "__main__":
    for job in (sys.argv[1:] or ["v15"]):
        JOBS[job]()
