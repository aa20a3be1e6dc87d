#!/bin/bash
# Round-3 queue H: after r3g — re-measure the engine sort path
# (config 3) with split word packing + embedded-id unstable sort +
# key-decode materialization (kernels/radix.py pack_split).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3h.log
echo "=== r3h queue start $(date -u +%H:%M:%S)" >> $LOG
while pgrep -f "queue_r3g.sh" > /dev/null 2>&1; do sleep 60; done
echo "=== r3g finished, proceeding $(date -u +%H:%M:%S)" >> $LOG
probe_ok() {
  for i in $(seq 1 200); do
    if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
      return 0
    fi
    echo "--- probe $i wedged $(date -u +%H:%M:%S)" >> $LOG
    sleep 240
  done
  return 1
}
run_job() {
  desc=$1; shift
  probe_ok || { echo "--- giving up before $desc" >> $LOG; return 1; }
  echo "--- $desc start $(date -u +%H:%M:%S)" >> $LOG
  timeout "$1" "${@:2}" >> $LOG 2>&1
  echo "--- $desc rc=$? $(date -u +%H:%M:%S)" >> $LOG
}
run_job sortmceng2 5400 python benchmarks/r3/measure_r3.py sortmceng
echo "=== r3h queue done $(date -u +%H:%M:%S)" >> $LOG
