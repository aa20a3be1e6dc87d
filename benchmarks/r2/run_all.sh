#!/bin/bash
# Resilient TPU measurement sweep: per-op subprocess + timeout; continues
# on wedge. Appends to results_tpu_r2.json via measure_r2.py.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/run_all.log
echo "=== sweep start $(date +%H:%M:%S)" >> $LOG
for op in probe compact variadic join groupby sortmerge sort rowgather broadcast; do
  echo "--- $op $(date +%H:%M:%S)" >> $LOG
  timeout 1800 python benchmarks/r2/measure_r2.py $op >> $LOG 2>&1
  echo "--- $op rc=$? $(date +%H:%M:%S)" >> $LOG
done
echo "--- bench.py $(date +%H:%M:%S)" >> $LOG
A1T_BENCH_TIMEOUT=1500 timeout 1700 python bench.py >> $LOG 2>&1
echo "=== sweep done $(date +%H:%M:%S)" >> $LOG
