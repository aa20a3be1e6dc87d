#!/bin/bash
# Tunnel watcher: probe every 10 min; when the compile service answers,
# run the q2 measurement queue once and exit.
cd /root/repo
LOG=benchmarks/r2/watch_q2.log
echo "=== watcher start $(date +%H:%M:%S)" >> $LOG
for i in $(seq 1 40); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
    echo "--- tunnel alive, launching q2 $(date +%H:%M:%S)" >> $LOG
    bash benchmarks/r2/run_q2.sh
    echo "=== q2 rc=$? $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
  sleep 600
done
echo "=== watcher gave up $(date +%H:%M:%S)" >> $LOG
