#!/bin/bash
# Probe-gate the tunnel, then run q5.
cd /root/repo
LOG=benchmarks/r2/watch_q5.log
echo "=== watcher5 start $(date +%H:%M:%S)" >> $LOG
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
    echo "--- tunnel alive, launching q5 $(date +%H:%M:%S)" >> $LOG
    bash benchmarks/r2/run_q5.sh
    echo "=== q5 rc=$? $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
  sleep 600
done
echo "=== watcher5 gave up $(date +%H:%M:%S)" >> $LOG
