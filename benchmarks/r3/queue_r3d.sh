#!/bin/bash
# Round-3 queue D: waits for r3c, then v9 validation + compile bisect +
# the re-measurements unlocked by the operand-count reductions.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3d.log
echo "=== r3d queue start $(date -u +%H:%M:%S)" >> $LOG
while pgrep -f "queue_r3c.sh" > /dev/null 2>&1; do sleep 60; done
echo "=== r3c finished, proceeding $(date -u +%H:%M:%S)" >> $LOG
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
run_job v9smoke 1800 python benchmarks/r3/v9_smoke.py
run_job cbisect 3000 python benchmarks/r3/compile_bisect.py
run_job compact9 3000 python benchmarks/r3/measure_r3.py compact9
run_job groupby3 3000 python benchmarks/r3/measure_r3.py groupby3
run_job sortmceng2 3000 python benchmarks/r3/measure_r3.py sortmceng
echo "=== r3d queue done $(date -u +%H:%M:%S)" >> $LOG
