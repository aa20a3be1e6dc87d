#!/bin/bash
# Round-3 queue G: after r3f — config-4 join at spec scale (100M probe x
# 10M build, skewed), then a final flagship bench re-run so BENCH_r03
# reflects the best measured kernel.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3g.log
echo "=== r3g queue start $(date -u +%H:%M:%S)" >> $LOG
while pgrep -f "queue_r3f.sh" > /dev/null 2>&1; do sleep 60; done
echo "=== r3f finished, proceeding $(date -u +%H:%M:%S)" >> $LOG
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
run_job join100m 5400 python benchmarks/r2/measure_r2.py join
run_job bench 900 env A1T_BENCH_TIMEOUT=600 python bench.py
echo "=== r3g queue done $(date -u +%H:%M:%S)" >> $LOG
