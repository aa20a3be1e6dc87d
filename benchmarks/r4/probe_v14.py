"""Word-plane extraction cost on TPU: bitcast+strided-slice (v12's
_to_words) vs arithmetic mask/shift (candidate).

Hypothesis (from bench_v13's 65 ms/iter anomaly): under x64 emulation
an i64 array is stored as separate hi/lo i32 planes, so
`bitcast_convert_type(i64 -> i32[n,2])` + minor-dim-2 slicing/reshape
is a RELAYOUT (TPU pads the 2-lane minor dim to 128), while
`(x & 0xFFFFFFFF).astype(i32)` / `(x >> 32).astype(i32)` just read the
planes. If confirmed: _to_words goes arithmetic, v13's interleaved
premise is dead, and the one-dot routing ports onto the v12 layout.

Writes benchmarks/r4/results_tpu_r4.json. Resumable.
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
L = 128


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
    x = jnp.asarray(rng.integers(-(1 << 62), 1 << 62, N)
                    .astype(np.int64))
    tiny = jax.jit(lambda v: v + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    ovh = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
              for _ in range(5))

    def timed(name, fn, inner=8):
        if name in done:
            return
        jf = jax.jit(fn)
        int(jax.device_get(jf(x)))
        times = [_t(lambda: int(jax.device_get(jf(x))))
                 for _ in range(4)]
        per = (min(times) - ovh) / inner
        _record(name, ms=round(per * 1e3, 3),
                times=[round(t, 3) for t in times])

    # v12's current _to_words: bitcast + strided minor-dim slices,
    # reshaped to [rows, 128] planes (what the pallas kernel consumes)
    def ext_bitcast(v):
        def body(i, acc):
            pair = jax.lax.bitcast_convert_type(v + i, jnp.int32)
            lo = pair[:, 0].reshape(-1, L)
            hi = pair[:, 1].reshape(-1, L)
            return acc + lo[0, 0] + hi[-1, -1] + lo[-1, -1] + hi[0, 0]
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    timed("v14p_ext_bitcast", ext_bitcast)

    # candidate: arithmetic plane extraction (x64 emulation stores i64
    # as hi/lo planes — mask/shift should be plane reads)
    def ext_arith(v):
        def body(i, acc):
            w = v + i
            lo = jax.lax.convert_element_type(
                w & jnp.int64(0xFFFFFFFF), jnp.uint32).reshape(-1, L)
            hi = jax.lax.convert_element_type(
                w >> jnp.int64(32), jnp.int32).reshape(-1, L)
            return (acc + lo[0, 0].astype(jnp.int32) + hi[-1, -1]
                    + lo[-1, -1].astype(jnp.int32) + hi[0, 0])
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    timed("v14p_ext_arith", ext_arith)

    # recombine: arithmetic lo|hi<<32 from [rows, 128] planes (what
    # _from_words already does) — for the full round-trip number
    def roundtrip_arith(v):
        def body(i, acc):
            w = v + i
            lo = jax.lax.convert_element_type(
                w & jnp.int64(0xFFFFFFFF), jnp.uint32)
            hi = jax.lax.convert_element_type(
                w >> jnp.int64(32), jnp.int32)
            back = (hi.astype(jnp.int64) << jnp.int64(32)) | \
                lo.astype(jnp.int64)
            return acc + jnp.int32(back[0] - w[0]) + jnp.int32(
                back[-1] - w[-1])
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    timed("v14p_roundtrip_arith", roundtrip_arith)


if __name__ == "__main__":
    main()
