#!/bin/bash
# Session-5 follow-on: waits for queue_s4 (exact PID), then runs the
# v6 multi-tile compaction A/B (the headline-metric pivot) and
# re-checks anything s3/s4 gave up on.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/queue_s5.log
WAIT_PID=${1:-0}
echo "=== s5 queue start $(date +%H:%M:%S) waiting on pid $WAIT_PID" >> $LOG
if [ "$WAIT_PID" != 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
probe_ok() {
  for i in $(seq 1 72); do
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
  timeout 3500 python benchmarks/r2/measure_r2.py "$job" >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
}
# headline pivot first
run_job compact6 compact_v6t4_r64_ab6
# anything the earlier queues gave up on (run_job skips what exists)
run_job compact5 compact_v5_r64_ab
run_job groupby2 groupby2_sortscan_10M_G1000000
run_job takepacked take_batch6_packed_10M
run_job sortmc sortmc_packed_100M
run_job join join_probe_100Mx10M
run_job sortmerge sortmerge_probe_10Mx1M
run_job tpch tpch_q1_10M
if ! grep -q "ablate_micro3_roll_S1536" benchmarks/r2/results_tpu_r2.json 2>/dev/null; then
  if probe_ok; then
    echo "--- micro3 start $(date +%H:%M:%S)" >> $LOG
    timeout 2500 python benchmarks/r2/ablate_v4.py micro3 >> $LOG 2>&1
    echo "--- micro3 rc=$? $(date +%H:%M:%S)" >> $LOG
  fi
fi
echo "=== s5 queue done $(date +%H:%M:%S)" >> $LOG
