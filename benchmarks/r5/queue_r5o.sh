#!/bin/bash
# Round-5 queue O: re-measure the fixed probe (last TPU window).
cd /root/repo
while pgrep -f "queue_r5n.sh" >/dev/null 2>&1; do sleep 20; done
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2 tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 100; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 30
  done
  return 1
}
runjob r5o_join5perf2 1500 2 python benchmarks/r5/measure_r5.py join5perf
