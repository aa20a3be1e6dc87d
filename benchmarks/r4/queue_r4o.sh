#!/bin/bash
# Round-4 last queue: join100m only (sortmc dropped — session-2 already
# measured config 3 post-d48b85b: indices 140.6 M rows/s / materialize
# 101.7 M at 100M, benchmarks/r3/results_tpu_r3.json sortmceng_*; the
# r4 duplicate's materialize leg also 413s the remote compiler).
# Every completed scan compile lands in .jax_cache, so even a timeout
# here buys the next round an instant build.
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2 tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 60
  done
  return 1
}
runjob join100m 2400 6 python benchmarks/r4/measure_r4.py join100m
runjob q1_r4 1200 2 python benchmarks/r4/measure_r4.py q1
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
