#!/bin/bash
# Round-4 queue, session-3 refresh #3: v14 TPU exactness gates the
# flagship A/B (the v13 lesson — interpret-green != TPU-correct);
# bench legs now default to plane-native inputs + out_limit.
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
runjob join100m 2400 2 python benchmarks/r4/measure_r4.py join100m
runjob sortmc 2000 2 python benchmarks/r4/measure_r4.py sortmc
runjob q1_r4 1200 2 python benchmarks/r4/measure_r4.py q1
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
runjob v14_ablate 1800 2 python benchmarks/r4/v14_ablate.py
runjob selgrid01 600 1 env A1T_BENCH_SEL=0.01 A1T_BENCH_TIMEOUT=500 python bench.py
runjob selgrid10 600 1 env A1T_BENCH_SEL=0.1 A1T_BENCH_TIMEOUT=500 python bench.py
runjob gbbisect2 1800 2 python benchmarks/r4/measure_r4.py gbbisect2
