#!/bin/bash
# Wait for q5 to finish, probe-gate, then measure the segsum-v2 group-by
# fast paths.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/watch_q6.log
echo "=== watcher6 start $(date +%H:%M:%S)" >> $LOG
while pgrep -f "run_q5.sh" > /dev/null 2>&1; do sleep 60; done
echo "--- q5 gone $(date +%H:%M:%S)" >> $LOG
for i in $(seq 1 40); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
    echo "--- tunnel alive, launching groupby2 $(date +%H:%M:%S)" >> $LOG
    timeout 3000 python benchmarks/r2/measure_r2.py groupby2 >> $LOG 2>&1
    echo "=== groupby2 rc=$? $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
  sleep 600
done
echo "=== watcher6 gave up $(date +%H:%M:%S)" >> $LOG
