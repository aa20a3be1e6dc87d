#!/bin/bash
# Session-3 follow-on queue: runs after queue_s2 finishes (or standalone).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/queue_s3.log
WAIT_PID=${1:-0}
echo "=== s3 queue start $(date +%H:%M:%S) waiting on pid $WAIT_PID" >> $LOG
if [ "$WAIT_PID" != 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run_job() {
  job=$1; key=$2
  if [ -n "$key" ] && grep -q "\"$key\"" benchmarks/r2/results_tpu_r2.json 2>/dev/null; then
    echo "--- skip $job (have $key) $(date +%H:%M:%S)" >> $LOG
    return 0
  fi
  ok=0
  for i in $(seq 1 60); do
    if timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >> $LOG 2>&1; then
      ok=1; break
    fi
    echo "--- probe $i wedged $(date +%H:%M:%S)" >> $LOG
    sleep 300
  done
  if [ $ok = 0 ]; then echo "=== gave up before $job $(date +%H:%M:%S)" >> $LOG; return 1; fi
  echo "--- $job start $(date +%H:%M:%S)" >> $LOG
  timeout 3500 python benchmarks/r2/measure_r2.py "$job" >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
}
run_job groupby2 groupby2_sortscan_10M_G1000000
run_job compact5 compact_v5_r64_ab
run_job takepacked take_batch6_packed_10M
run_job sortmc sortmc_packed_100M
run_job join join_probe_100Mx10M
run_job sortmerge sortmerge_probe_10Mx1M
echo "=== s3 queue done $(date +%H:%M:%S)" >> $LOG
