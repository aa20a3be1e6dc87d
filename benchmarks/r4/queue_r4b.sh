#!/bin/bash
# Round-4 TPU queue B: group-by residual bisect, join-build compile
# bisect, flagship bench retries. Tunnel-health gated; one retry each.
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() { # name budget cmd...
  local name=$1 budget=$2; shift 2
  for attempt in 1 2; do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 60
  done
  return 1
}
runjob gbbisect2 1800 python benchmarks/r4/measure_r4.py gbbisect2
runjob jb_sort3 1000 python benchmarks/r4/jb_bisect.py sort3
runjob jb_scanmax 1000 python benchmarks/r4/jb_bisect.py scanmax
runjob jb_scanminrev 1000 python benchmarks/r4/jb_bisect.py scanminrev
runjob jb_cumsumi32 1000 python benchmarks/r4/jb_bisect.py cumsumi32
runjob jb_runsall 1000 python benchmarks/r4/jb_bisect.py runsall
runjob jb_scatter 1000 python benchmarks/r4/jb_bisect.py scatter
runjob bench_v7 600 env A1T_BENCH_KERNEL=v7:8 A1T_BENCH_TIMEOUT=500 python bench.py
