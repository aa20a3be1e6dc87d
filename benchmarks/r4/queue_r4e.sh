#!/bin/bash
# Round-4 TPU queue E: gbbisect2 remaining legs (resumable now). Waits for D.
PREV_PID=${1:-}
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2; shift 2
  for attempt in 1 2; do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 60
  done
  return 1
}
runjob gbbisect2_rest 1800 python benchmarks/r4/measure_r4.py gbbisect2
