#!/bin/bash
# Round-4 queue, session-3 refresh #2: v13 legs dropped (probe_v13
# measured the raw kernel at 76.6 ms — the interleaved layout
# relayouts, dead end; flagship ~65 ms/iter was already recorded in
# session 2). v14 (word-plane layout + one-dot routing) is the live
# candidate; out_limit landed, so champion v7 gets remeasured too.
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
runjob probe_v14 1200 2 python benchmarks/r4/probe_v14.py
runjob bench_v14 1300 2 env A1T_BENCH_KERNEL=v14:256:152 A1T_BENCH_TIMEOUT=1200 python bench.py
runjob bench_v7 900 2 env A1T_BENCH_KERNEL=v7:8 A1T_BENCH_TIMEOUT=800 python bench.py
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
runjob join100m 2400 3 python benchmarks/r4/measure_r4.py join100m
runjob sortmc 2000 2 python benchmarks/r4/measure_r4.py sortmc
runjob q1_r4 900 2 python benchmarks/r4/measure_r4.py q1
runjob v14_ablate 1800 2 python benchmarks/r4/v14_ablate.py
runjob bench_v12 900 1 env A1T_BENCH_KERNEL=v12:256:152 A1T_BENCH_TIMEOUT=800 python bench.py
runjob selgrid01 600 1 env A1T_BENCH_SEL=0.01 A1T_BENCH_TIMEOUT=500 python bench.py
runjob selgrid10 600 1 env A1T_BENCH_SEL=0.1 A1T_BENCH_TIMEOUT=500 python bench.py
runjob gbbisect2 1800 2 python benchmarks/r4/measure_r4.py gbbisect2
runjob jb_sort3 1000 1 python benchmarks/r4/jb_bisect.py sort3
runjob jb_runsall 1000 1 python benchmarks/r4/jb_bisect.py runsall
runjob jb_scatter 1000 1 python benchmarks/r4/jb_bisect.py scatter
