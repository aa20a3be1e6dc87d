"""TPU lowering/cost probes for the v13 interleaved-plane design.

1. Does `bitcast_convert_type(i32[n,2] -> i64[n])` lower on this
   toolchain (TOOLCHAIN_NOTES only certifies the i64 -> i32x2
   direction)? v13's output recombine defaults to it; the arith
   fallback is A1T_V13_RECOMBINE=arith.
2. Cost of the free-view chain i64 -> interleaved i32 planes.
3. Cost of a strided deinterleave slice (the alternative v13 avoids).
4. v13 kernel exactness at 10M on the real TPU (vs host oracle),
   plus its raw kernel time at the default (256, 152) config.

Resumable: legs with a recorded result are skipped (the axon tunnel
wedges mid-job; retries continue from the last record).
Writes benchmarks/r4/results_tpu_r4.json.
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

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r4.json")
N = 10_000_000


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


def main():
    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.integers(-(1 << 62), 1 << 62, N)
                      .astype(np.int64))
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    ovh = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
              for _ in range(5))

    if "v13p_bitcast_i32x2_to_i64" not in done:
        try:
            @jax.jit
            def bc(x):
                pair = jax.lax.bitcast_convert_type(x, jnp.int32)
                back = jax.lax.bitcast_convert_type(pair, jnp.int64)
                return back[0] + back[-1]

            got = int(jax.device_get(bc(x64)))
            exp = int(x64[0]) + int(x64[-1])
            _record("v13p_bitcast_i32x2_to_i64", ok=bool(got == exp))
        except Exception as e:  # lowering failure
            _record("v13p_bitcast_i32x2_to_i64", ok=False,
                    error=str(e)[:200])

    if "v13p_viewchain_ms" not in done:
        @jax.jit
        def view_chain(x):
            def body(i, acc):
                pair = jax.lax.bitcast_convert_type(x + i, jnp.int32)
                pl_ = pair.reshape(-1, 128)
                return acc + pl_[0, 0] + pl_[-1, -1]
            return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

        int(jax.device_get(view_chain(x64)))
        times = [_t(lambda: int(jax.device_get(view_chain(x64))))
                 for _ in range(4)]
        _record("v13p_viewchain_ms",
                ms=round((min(times) - ovh) / 8 * 1e3, 3),
                times=[round(t, 3) for t in times])

    if "v13p_deinterleave_ms" not in done:
        @jax.jit
        def deint(x):
            def body(i, acc):
                pair = jax.lax.bitcast_convert_type(x + i, jnp.int32)
                lo = pair[:, 0]
                hi = pair[:, 1]
                return acc + lo[0] + hi[-1] + lo[-1] + hi[0]
            return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

        int(jax.device_get(deint(x64)))
        times = [_t(lambda: int(jax.device_get(deint(x64))))
                 for _ in range(4)]
        _record("v13p_deinterleave_ms",
                ms=round((min(times) - ovh) / 8 * 1e3, 3),
                times=[round(t, 3) for t in times])

    # --- 4. v13 exactness + raw kernel time at 10M -------------------
    from arrow1_tpu.kernels.compaction_v13 import compact_v13

    R, BAND = 256, 152
    n = N // (R * 64) * (R * 64)
    key = x64[:n]
    v = jnp.asarray(rng.integers(0, 1 << 63, n).astype(np.uint64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    maskh = rng.random(n) < 0.5
    mask = jnp.asarray(maskh)

    if "v13p_exact_10M" not in done:
        t0 = time.perf_counter()
        (ok, ov, of), count = compact_v13(mask, (key, v, fb),
                                          rows=R, band=BAND)
        jax.block_until_ready(ok)
        compile_s = time.perf_counter() - t0
        cnt = int(count)
        kh = np.asarray(key)[maskh]
        exact = (cnt == int(maskh.sum())
                 and np.array_equal(np.asarray(ok[:cnt]), kh)
                 and np.array_equal(np.asarray(ov[:cnt]),
                                    np.asarray(v)[maskh])
                 and np.array_equal(np.asarray(of[:cnt]),
                                    np.asarray(fb)[maskh]))
        _record("v13p_exact_10M", ok=bool(exact), count=cnt,
                compile_s=round(compile_s, 1))

    if f"v13p_kernel_r{R}b{BAND}" not in done:
        @jax.jit
        def step(m, a, b, c):
            def body(i, acc):
                (o1, o2, o3), ct = compact_v13(m, (a + i, b, c),
                                               rows=R, band=BAND)
                return (acc + o1[0] + o3[0]
                        + o2[0].astype(jnp.int64)
                        + ct.astype(jnp.int64))
            return jax.lax.fori_loop(0, 8, body, jnp.int64(0))

        t0 = time.perf_counter()
        int(jax.device_get(step(mask, key, v, fb)))
        compile_s = time.perf_counter() - t0
        times = [_t(lambda: int(jax.device_get(step(mask, key, v, fb))))
                 for _ in range(4)]
        per = (min(times) - ovh) / 8
        _record(f"v13p_kernel_r{R}b{BAND}", ms=round(per * 1e3, 3),
                mrows_s=round(n / per / 1e6, 1),
                compile_s=round(compile_s, 1),
                times=[round(t, 3) for t in times])


if __name__ == "__main__":
    main()
