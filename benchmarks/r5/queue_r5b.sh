#!/bin/bash
# Round-5 queue B: f32x2 projection split + fused flagship candidate.
# Waits for queue A to drain (one TPU, serialized access).
cd /root/repo
while pgrep -f "queue_r5a.sh" >/dev/null 2>&1; do sleep 60; done
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
runjob r5b_ddsplit 600 2 python benchmarks/r5/probe_r5b.py ddsplit
runjob r5b_prepass2 600 2 python benchmarks/r5/probe_r5b.py prepass2
runjob r5b_fusedA 1500 2 python benchmarks/r5/probe_r5b.py fusedA
runjob r5a_dma_retry 900 2 python benchmarks/r5/probe_r5a.py dma
