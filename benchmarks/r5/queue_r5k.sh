#!/bin/bash
# Round-5 queue K: canonical v15 rerun (both earlier attempts raced a
# bug fix) + any stragglers.
cd /root/repo
while pgrep -f "queue_r5[abcdij].sh" >/dev/null 2>&1; do sleep 60; done
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
runjob r5k_v15 1800 3 python benchmarks/r5/probe_r5d.py v15
runjob r5k_movebound2 300 1 python benchmarks/r5/movement_bound.py
runjob r5k_bench_final3 1300 1 env A1T_BENCH_TIMEOUT=1200 python bench.py
