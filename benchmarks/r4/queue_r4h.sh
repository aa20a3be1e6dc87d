#!/bin/bash
# Round-4 queue, session-3 refresh of queue_r4g (priority order):
#  1. probe_v13   finish the raw-kernel-time leg (rest recorded)
#  2. bench_v13   flagship A/B at (256,152)
#  3. probe_v14   v14 exactness + raw kernel time
#  4. bench_v14   flagship A/B for the newest kernel
#  5. gbengine    remaining G=100K + scmm legs (resumable)
#  6. join100m    config-4 at spec scale, staged build  << 2 rounds missing
#  7. sortmc      BASELINE config 3 after d48b85b (landed-unmeasured)
#  8. q1          tpch q1 remeasure after tail/kernel changes
#  9. bench_v7    champion baseline with the slimmed consumers
# 10. ablations / selectivity grid / bisects
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
runjob probe_v13 1200 2 python benchmarks/r4/probe_v13.py
runjob bench_v13 1300 2 env A1T_BENCH_KERNEL=v13:256:152 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob probe_v14 1200 2 python benchmarks/r4/probe_v14.py
runjob bench_v14 1300 2 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
runjob join100m 2400 3 python benchmarks/r4/measure_r4.py join100m
runjob sortmc 2000 2 python benchmarks/r4/measure_r4.py sortmc
runjob q1_r4 900 2 python benchmarks/r4/measure_r4.py q1
runjob bench_v7 600 2 env A1T_BENCH_KERNEL=v7:8 A1T_BENCH_TIMEOUT=500 python bench.py
runjob v14_ablate 1800 2 python benchmarks/r4/v14_ablate.py
runjob bench_v13_128 1300 1 env A1T_BENCH_KERNEL=v13:128:88 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob selgrid01 600 1 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_SEL=0.01 A1T_BENCH_TIMEOUT=500 python bench.py
runjob selgrid10 600 1 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_SEL=0.1 A1T_BENCH_TIMEOUT=500 python bench.py
runjob gbbisect2 1800 2 python benchmarks/r4/measure_r4.py gbbisect2
runjob jb_sort3 1000 1 python benchmarks/r4/jb_bisect.py sort3
runjob jb_runsall 1000 1 python benchmarks/r4/jb_bisect.py runsall
runjob jb_scatter 1000 1 python benchmarks/r4/jb_bisect.py scatter
