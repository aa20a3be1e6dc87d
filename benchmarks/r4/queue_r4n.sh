#!/bin/bash
# Round-4 final minutes: sortmc (config 3 after d48b85b, the last
# landed-unmeasured verdict item) gets the remaining TPU window; the
# join100m retry resumes afterwards and keeps warming scan caches for
# the next round if the session ends first.
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
runjob sortmc 2000 2 python benchmarks/r4/measure_r4.py sortmc
runjob join100m 2400 4 python benchmarks/r4/measure_r4.py join100m
runjob q1_r4 1200 2 python benchmarks/r4/measure_r4.py q1
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
