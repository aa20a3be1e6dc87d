#!/bin/bash
# Round-3 queue A: probe-gated TPU measurements, priority order:
#   1. measure_r3 groupby3 q1caps  (config 2 at G=1K/100K/1M + q1@4k)
#   2. measure_r3 sortmceng        (config 3 through engine entry points)
#   3. measure_r2 join             (config 4: 100Mx10M build/probe/skew)
#   4. bench.py                    (flagship JSON line)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r3/queue_r3a.log
echo "=== r3a queue start $(date -u +%H:%M:%S)" >> $LOG
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
run_job groupby3 2400 python benchmarks/r3/measure_r3.py groupby3
run_job q1caps 1200 python benchmarks/r3/measure_r3.py q1caps
run_job sortmceng 2400 python benchmarks/r3/measure_r3.py sortmceng
run_job join100m 2400 python benchmarks/r2/measure_r2.py join
run_job bench 900 env A1T_BENCH_TIMEOUT=600 python bench.py
echo "=== r3a queue done $(date -u +%H:%M:%S)" >> $LOG
