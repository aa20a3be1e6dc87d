#!/bin/bash
# queue 5: the two still-unmeasured big configs, one process per graph,
# 58-min timeouts, each attempted twice (persistent compile cache makes
# the retry resume where the timeout cut the first attempt).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/run_q5.log
echo "=== q5 start $(date +%H:%M:%S)" >> $LOG
for job in sortmerge join sortmerge join; do
  if [ "$job" = sortmerge ] && grep -q sortmerge_probe_10Mx1M benchmarks/r2/results_tpu_r2.json; then continue; fi
  if [ "$job" = join ] && grep -q join_probe_100Mx10M benchmarks/r2/results_tpu_r2.json; then continue; fi
  echo "--- $job $(date +%H:%M:%S)" >> $LOG
  timeout 3500 python benchmarks/r2/measure_r2.py $job >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
done
echo "=== q5 done $(date +%H:%M:%S)" >> $LOG
