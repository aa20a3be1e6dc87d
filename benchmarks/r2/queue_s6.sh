#!/bin/bash
# Session-6 follow-on: waits for queue_s5 (exact PID), then measures the
# v7 compaction A/B (headline pivot), the fixed groupby2 sorted-scan,
# the v6 stage ablation, and finally runs bench.py on the real chip.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/queue_s6.log
WAIT_PID=${1:-0}
echo "=== s6 queue start $(date +%H:%M:%S) waiting on pid $WAIT_PID" >> $LOG
if [ "$WAIT_PID" != 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
probe_ok() {
  for i in $(seq 1 36); do
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
  timeout 3000 python benchmarks/r2/measure_r2.py "$job" >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
}
run_job compact7 compact_v7t8_r64_ab6
run_job groupby2 groupby2_sortscan_10M_G1000000
if ! grep -q "ablate_v6_stage4" benchmarks/r2/results_tpu_r2.json 2>/dev/null; then
  if probe_ok; then
    echo "--- ablate_v6 start $(date +%H:%M:%S)" >> $LOG
    timeout 2500 python benchmarks/r2/ablate_v6.py >> $LOG 2>&1
    echo "--- ablate_v6 rc=$? $(date +%H:%M:%S)" >> $LOG
  fi
fi
if probe_ok; then
  echo "--- bench.py start $(date +%H:%M:%S)" >> $LOG
  timeout 1200 python bench.py >> $LOG 2>&1
  echo "--- bench.py rc=$? $(date +%H:%M:%S)" >> $LOG
fi
echo "=== s6 queue done $(date +%H:%M:%S)" >> $LOG
