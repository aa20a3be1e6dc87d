#!/bin/bash
# Round-3 queue B: waits for queue A (exact PID), then the v8 compaction
# A/B and a bench.py re-run with the updated auto-selection.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3b.log
WAIT_PID=${1:-0}
echo "=== r3b start $(date -u +%H:%M:%S) waiting on $WAIT_PID" >> $LOG
if [ "$WAIT_PID" != 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
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
run_job groupby3b 2400 python benchmarks/r3/measure_r3.py groupby3
run_job compact8 2400 python benchmarks/r3/measure_r3.py compact8
run_job tpch 2400 python benchmarks/r2/measure_r2.py tpch
run_job bench2 900 env A1T_BENCH_TIMEOUT=600 python bench.py
echo "=== r3b done $(date -u +%H:%M:%S)" >> $LOG
