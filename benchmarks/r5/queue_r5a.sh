#!/bin/bash
# Round-5 queue A: flagship cost-model probes (see probe_r5a.py).
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
runjob r5a_dma 900 2 python benchmarks/r5/probe_r5a.py dma
runjob r5a_w4 1200 2 python benchmarks/r5/probe_r5a.py w4
runjob r5a_prepass 600 2 python benchmarks/r5/probe_r5a.py prepass
runjob r5a_int8 1500 2 python benchmarks/r5/probe_r5a.py int8
runjob r5a_w6 1200 2 python benchmarks/r5/probe_r5a.py w6
