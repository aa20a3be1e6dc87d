#!/bin/bash
# Wait for q2 to finish, then probe-gate and run q3.
cd /root/repo
LOG=benchmarks/r2/watch_q3.log
echo "=== watcher3 start $(date +%H:%M:%S)" >> $LOG
while pgrep -f "run_q2.sh" > /dev/null 2>&1; do sleep 60; done
echo "--- q2 gone $(date +%H:%M:%S)" >> $LOG
for i in $(seq 1 40); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
    echo "--- tunnel alive, launching q3 $(date +%H:%M:%S)" >> $LOG
    bash benchmarks/r2/run_q3.sh
    echo "=== q3 rc=$? $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
  sleep 600
done
echo "=== watcher3 gave up $(date +%H:%M:%S)" >> $LOG
