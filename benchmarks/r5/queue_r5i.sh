#!/bin/bash
# Round-5 queue I (consolidates the former E/F/G): i8 diagnosis first
# (gates the flagship champion), then perf + final bench legs.
cd /root/repo
while pgrep -f "queue_r5[abcd].sh" >/dev/null 2>&1; do sleep 60; done
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
runjob r5i_i8diag 1500 2 python benchmarks/r5/probe_r5b.py i8diag
runjob r5i_v15split 1800 2 python benchmarks/r5/probe_r5d.py v15split
runjob r5i_join5perf 2400 2 python benchmarks/r5/measure_r5.py join5perf
runjob r5i_overflow5 1500 2 python benchmarks/r5/measure_r5.py overflow5
runjob r5i_movebound 300 1 python benchmarks/r5/movement_bound.py
runjob r5i_bench_final 1300 2 env A1T_BENCH_TIMEOUT=1200 python bench.py
