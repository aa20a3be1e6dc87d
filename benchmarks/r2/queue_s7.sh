#!/bin/bash
# Session-5 tail: after the groupby2 rerun (exact PID), measure the
# remaining pending ops, largest-value-first, probe-gated.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/queue_s7.log
WAIT_PID=${1:-0}
echo "=== s7 start $(date +%H:%M:%S) waiting on pid $WAIT_PID" >> $LOG
if [ "$WAIT_PID" != 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
probe_ok() {
  for i in $(seq 1 24); do
    if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
      return 0
    fi
    echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
    sleep 300
  done
  return 1
}
run_job() {
  job=$1; key=$2
  if [ -n "$key" ] && grep -q "\"$key\"" benchmarks/r2/results_tpu_r2.json 2>/dev/null; then
    echo "--- skip $job (have $key) $(date +%H:%M:%S)" >> $LOG
    return 0
  fi
  probe_ok || { echo "=== gave up before $job $(date +%H:%M:%S)" >> $LOG; return 1; }
  echo "--- $job start $(date +%H:%M:%S)" >> $LOG
  timeout 2500 python benchmarks/r2/measure_r2.py "$job" >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
}
run_job tpch tpch_q1_10M
run_job sortmerge sortmerge_probe_10Mx1M
run_job join join_probe_100Mx10M
echo "=== s7 done $(date +%H:%M:%S)" >> $LOG
