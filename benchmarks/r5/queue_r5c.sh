#!/bin/bash
# Round-5 queue C: fused-path validation + flagship A/B + engine-grade
# config 4 + staged group-by measurements.
cd /root/repo
while pgrep -f "queue_r5[ab].sh" >/dev/null 2>&1; do sleep 60; done
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
runjob r5c_fusedB 1500 2 python benchmarks/r5/probe_r5b.py fusedB
runjob r5c_fusedA2 900 2 python benchmarks/r5/probe_r5b.py fusedA
runjob r5c_bench_i8 1300 2 env A1T_BENCH_KERNEL=v14:256:152:i8 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob r5c_bench_bf16 900 2 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_TIMEOUT=800 python bench.py
runjob r5c_gb5staged 2400 2 python benchmarks/r5/measure_r5.py gb5staged
runjob r5c_join100m_engine 4000 2 python benchmarks/r5/measure_r5.py join100m_engine
runjob r5c_gb5cold 3200 1 python benchmarks/r5/measure_r5.py gb5cold
