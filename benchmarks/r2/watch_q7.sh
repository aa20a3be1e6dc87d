#!/bin/bash
# Wait for q5 to finish, probe-gate, then measure the segsum-v2 group-by
# fast paths.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/watch_q7.log
echo "=== watcher7 start $(date +%H:%M:%S)" >> $LOG
while pgrep -f "watch_q6.sh" > /dev/null 2>&1; do sleep 60; done
echo "--- q6 gone $(date +%H:%M:%S)" >> $LOG
for i in $(seq 1 40); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
    echo "--- tunnel alive, launching q7 $(date +%H:%M:%S)" >> $LOG
    timeout 3500 python benchmarks/r2/measure_r2.py compact5 >> $LOG 2>&1
    echo "--- compact5 rc=$? $(date +%H:%M:%S)" >> $LOG
    timeout 3500 python benchmarks/r2/measure_r2.py sortmc >> $LOG 2>&1
    echo "=== q7 sortmc rc=$? $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
  sleep 600
done
echo "=== watcher7 gave up $(date +%H:%M:%S)" >> $LOG
