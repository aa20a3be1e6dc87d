#!/bin/bash
# Round-5 queue M: priority-ordered FINAL runs (flagship first).
cd /root/repo
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
runjob r5m_v15 1500 2 python benchmarks/r5/probe_r5d.py v15
runjob r5m_bench 1300 2 env A1T_BENCH_TIMEOUT=1200 python bench.py
runjob r5m_join100m_engine 5000 2 python benchmarks/r5/measure_r5.py join100m_engine
runjob r5m_i8diag 1200 1 python benchmarks/r5/probe_r5b.py i8diag
runjob r5m_join5perf 2000 1 python benchmarks/r5/measure_r5.py join5perf
runjob r5m_overflow5 1200 1 python benchmarks/r5/measure_r5.py overflow5
runjob r5m_movebound 300 1 python benchmarks/r5/movement_bound.py
runjob r5m_bench2 900 1 env A1T_BENCH_TIMEOUT=800 python bench.py
