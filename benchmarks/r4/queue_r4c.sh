#!/bin/bash
# Round-4 TPU queue C: v13 probes + flagship A/B. Waits for queue B.
PREV_PID=${1:-}
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
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
runjob probe_v13 1200 python benchmarks/r4/probe_v13.py
runjob bench_v13 600 env A1T_BENCH_KERNEL=v13:256:152 A1T_BENCH_TIMEOUT=500 python bench.py
runjob bench_v13_128 600 env A1T_BENCH_KERNEL=v13:128:88 A1T_BENCH_TIMEOUT=500 python bench.py
