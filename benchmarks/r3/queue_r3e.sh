#!/bin/bash
# Round-3 queue E: after r3d — config-4 join retry (now compile-light:
# one-sort build + blocked scans), q1 re-measure, flagship bench.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3e.log
echo "=== r3e queue start $(date -u +%H:%M:%S)" >> $LOG
while pgrep -f "queue_r3d.sh" > /dev/null 2>&1; do sleep 60; done
echo "=== r3d finished, proceeding $(date -u +%H:%M:%S)" >> $LOG
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
run_job join100m 3000 python benchmarks/r2/measure_r2.py join
run_job q1caps 1800 python benchmarks/r3/measure_r3.py q1caps
run_job bench 900 env A1T_BENCH_TIMEOUT=600 python bench.py
echo "=== r3e queue done $(date -u +%H:%M:%S)" >> $LOG
