#!/bin/bash
# Round-4 TPU queue A: sort (d48b85b, unmeasured in r3) + flagship A/B.
# Tunnel-health gated; each job retried once after a cool-down.
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() { # name cmd...
  local name=$1; shift
  for attempt in 1 2; do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout 2400 "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name rc=$?"; sleep 60
  done
  return 1
}
runjob sortmceng python benchmarks/r3/measure_r3.py sortmceng
runjob bench_v7 env A1T_BENCH_KERNEL=v7:8 A1T_BENCH_TIMEOUT=500 python bench.py
runjob bench_v12 env A1T_BENCH_KERNEL=v12:256:152 A1T_BENCH_TIMEOUT=500 python bench.py
runjob gbbisect python benchmarks/r4/measure_r4.py gbbisect
runjob join100m timeout 3000 python benchmarks/r4/measure_r4.py join100m
