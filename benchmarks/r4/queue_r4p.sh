#!/bin/bash
# Round-4 continuation queue: config-4 join100m (the last unmeasured
# BASELINE config). Build-stage kernels are already in .jax_cache from
# the r4o window, so the staged build should compile near-instantly;
# probe/materialize legs compile one chunk-sized program each.
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2 tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 30
  done
  return 1
}
runjob join100m 1800 3 python benchmarks/r4/measure_r4.py join100m
