"""Raw achievable-HBM probe on the attached chip. Defines the real
speed of light the flagship compaction should be judged against (the
BASELINE 819 GB/s v5e figure has never been validated on this tunnel
chip; every compaction variant v6-v11 plateaus at ~7 ms / 10M rows).

Measurement notes: block_until_ready does NOT block on the axon
platform — only a device_get forces completion (same reason
measure_r*.py's M class exists). Each probe is a fori_loop whose carry
is the full ARRAY (loop-carried dependence defeats XLA fusion/DCE
across iterations), timed around a device_get of a scalar, with the
~28 ms dispatch floor subtracted."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

RESULTS = os.path.join(os.path.dirname(__file__), "results_tpu_r3.json")


def _record(name, **kv):
    try:
        with open(RESULTS) as f:
            d = json.load(f)
    except Exception:
        d = {}
    kv["at"] = time.strftime("%H:%M:%S")
    d[name] = kv
    with open(RESULTS, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
    print(name, json.dumps(kv), flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    floor = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
                for _ in range(5))
    print(f"dispatch floor {floor*1e3:.1f} ms", flush=True)

    n32 = 128 * 1024 * 1024          # 512 MB per u32 array
    x32 = jnp.arange(n32, dtype=jnp.uint32)
    INNER = 16

    # copy: y_{k+1} = y_k + 1, array-carried -> 1 read + 1 write / iter
    @jax.jit
    def copy_loop(x):
        y = jax.lax.fori_loop(
            0, INNER, lambda i, y: y + jnp.uint32(1), x)
        return y[0] + y[-1]

    float(jax.device_get(copy_loop(x32)))
    t = min(_t(lambda: float(jax.device_get(copy_loop(x32))))
            for _ in range(4))
    per = max(t - floor, 1e-9) / INNER
    _record("hbm2_copy_u32_512M", ms=round(per * 1e3, 2),
            gb_s=round(2 * 4 * n32 / per / 1e9, 1))

    # read: acc += sum(x * (i+1)) -> 1 read / iter, scalar carry
    @jax.jit
    def read_loop(x):
        def body(i, acc):
            return acc + jnp.sum((x * (i + 1).astype(jnp.uint32)),
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, INNER, body, jnp.uint32(0))

    float(jax.device_get(read_loop(x32)))
    t = min(_t(lambda: float(jax.device_get(read_loop(x32))))
            for _ in range(4))
    per = max(t - floor, 1e-9) / INNER
    _record("hbm2_read_u32_512M", ms=round(per * 1e3, 2),
            gb_s=round(4 * n32 / per / 1e9, 1))

    # triad: z = x + z * i -> 2 reads + 1 write / iter
    @jax.jit
    def triad_loop(x):
        z = jax.lax.fori_loop(
            0, INNER,
            lambda i, z: x + z * (i + 1).astype(jnp.uint32), x)
        return z[0] + z[-1]

    float(jax.device_get(triad_loop(x32)))
    t = min(_t(lambda: float(jax.device_get(triad_loop(x32))))
            for _ in range(4))
    per = max(t - floor, 1e-9) / INNER
    _record("hbm2_triad_u32_512M", ms=round(per * 1e3, 2),
            gb_s=round(3 * 4 * n32 / per / 1e9, 1))

    # i64 copy (x64 plane: what the flagship's int64 columns pay)
    n64 = 64 * 1024 * 1024
    x64 = jnp.arange(n64, dtype=jnp.int64)

    @jax.jit
    def copy64_loop(x):
        y = jax.lax.fori_loop(
            0, INNER, lambda i, y: y + jnp.int64(1), x)
        return y[0] + y[-1]

    float(jax.device_get(copy64_loop(x64)))
    t = min(_t(lambda: float(jax.device_get(copy64_loop(x64))))
            for _ in range(4))
    per = max(t - floor, 1e-9) / INNER
    _record("hbm2_copy_i64_512M", ms=round(per * 1e3, 2),
            gb_s=round(2 * 8 * n64 / per / 1e9, 1))


if __name__ == "__main__":
    main()
