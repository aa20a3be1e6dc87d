#!/bin/bash
# Round-4 consolidated TPU queue (priority order):
#  1. probe_v13    v13 lowering/exactness on real TPU + raw kernel time
#  2. bench_v13    flagship A/B at (256,152) and (128,88)
#  3. gbengine     group-by G=1M/100K through the rewritten engine
#  4. join100m     config-4 at spec scale, staged build
#  5. v13_ablate   stage costs for the next kernel iteration
#  6. bench_v7     champion baseline with slimmed consumers
#  7. jb_bisect    fused-build compile-hog diagnosis
#  8. gbbisect2    remaining residual legs (resumable)
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
runjob bench_v13_128 1300 1 env A1T_BENCH_KERNEL=v13:128:88 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
runjob probe_v14 900 2 python benchmarks/r4/probe_v14.py
runjob bench_v14 1300 2 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob join100m 2400 3 python benchmarks/r4/measure_r4.py join100m
runjob v14_ablate 1800 2 python benchmarks/r4/v14_ablate.py
runjob bench_v7 600 2 env A1T_BENCH_KERNEL=v7:8 A1T_BENCH_TIMEOUT=500 python bench.py
runjob jb_sort3 1000 1 python benchmarks/r4/jb_bisect.py sort3
runjob jb_runsall 1000 1 python benchmarks/r4/jb_bisect.py runsall
runjob jb_scatter 1000 1 python benchmarks/r4/jb_bisect.py scatter
runjob gbbisect2 1800 2 python benchmarks/r4/measure_r4.py gbbisect2
runjob q1_r4 900 2 python benchmarks/r4/measure_r4.py q1
runjob selgrid01 600 1 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_SEL=0.01 A1T_BENCH_TIMEOUT=500 python bench.py
runjob selgrid10 600 1 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_SEL=0.1 A1T_BENCH_TIMEOUT=500 python bench.py
