#!/bin/bash
# Round-5 queue N: bench immediately after the in-flight engine join.
cd /root/repo
while pgrep -f "measure_r5.py join100m_engine" >/dev/null 2>&1; do sleep 30; done
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2 tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 100; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 30
  done
  return 1
}
runjob r5n_bench 1300 3 env A1T_BENCH_TIMEOUT=1250 python bench.py
runjob r5n_i8diag 1000 1 python benchmarks/r5/probe_r5b.py i8diag
runjob r5n_join5perf 1800 1 python benchmarks/r5/measure_r5.py join5perf
runjob r5n_overflow5 1000 1 python benchmarks/r5/measure_r5.py overflow5
runjob r5n_movebound 300 1 python benchmarks/r5/movement_bound.py
