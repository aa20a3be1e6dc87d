"""Flagship benchmark: fused filter+project throughput (BASELINE config 1).

Prints ONE JSON line:
  {"metric": ..., "value": rows/sec, "unit": "rows/s", "vs_baseline": frac}

vs_baseline = achieved_bytes_per_sec / (0.80 * HBM_peak) — i.e. 1.0 means
the operator hits the BASELINE target of 80% of the HBM roofline on this
chip (the reference publishes no absolute numbers: BASELINE.md — the
roofline fraction IS the contract).

Traffic accounting per row (the roofline denominator):
  read  key int64 (8) + v int64 (8) + f float64 (8)      = 24 B
  write compacted key+proj at selectivity s (16 * s)     = 8 B @ s=0.5
  (intermediate mask/index traffic ignored -> conservative, XLA fuses)
"""

import json
import os
import sys
import time

import numpy as np

# HBM peak bytes/s per chip by device kind (public figures)
HBM_PEAK = {
    "TPU v5 lite": 819e9,   # v5e: 819 GB/s
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,      # 2.77 TB/s
    "TPU v4": 1228e9,
    "TPU v6e": 1640e9,
    "cpu": 50e9,            # nominal, for local smoke runs
}


def main():
    import jax
    import jax.numpy as jnp

    import arrow1_tpu  # noqa: F401  (x64 on)
    from arrow1_tpu.ops.padded import filter_padded

    N = int(os.environ.get("A1T_BENCH_ROWS", 10_000_000))
    ITERS = int(os.environ.get("A1T_BENCH_ITERS", 5))

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    peak = next((v for k, v in HBM_PEAK.items() if k in str(kind)), 50e9)

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, N).astype(np.int64))
    f = jnp.asarray(rng.standard_normal(N))

    @jax.jit
    def filter_project(key, v, f):
        mask = (f > 0.0) & (v > jnp.int64(0))
        idx, count = filter_padded(mask)
        out_key = key[idx]
        proj = v[idx].astype(jnp.float64) * 2.0 + f[idx]
        return out_key, proj, count

    # warmup / compile
    out = filter_project(key, v, f)
    jax.block_until_ready(out)
    sel = float(out[2]) / N

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = filter_project(key, v, f)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rows_per_sec = N / dt
    bytes_per_row = 24 + 16 * sel
    achieved_bw = rows_per_sec * bytes_per_row
    target = 0.80 * peak
    print(json.dumps({
        "metric": "filter_project_rows_per_sec",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(achieved_bw / target, 4),
    }))


if __name__ == "__main__":
    main()
