#!/bin/bash
# Round-5 queue J: engine-grade config 4 re-run on the flat PackedTable
# layout (the first attempt OOMed on the padded [nb, ways] u64 tables).
cd /root/repo
while pgrep -f "queue_r5[abcdi].sh" >/dev/null 2>&1; do sleep 60; done
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
runjob r5j_join100m_engine 5000 2 python benchmarks/r5/measure_r5.py join100m_engine
runjob r5j_bench_final2 1300 1 env A1T_BENCH_TIMEOUT=1200 python bench.py
