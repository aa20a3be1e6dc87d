#!/bin/bash
# queue 3: v5 kernel design probes + retries of the timed-out operators
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/run_q3.log
echo "=== q3 start $(date +%H:%M:%S)" >> $LOG
echo "--- probe $(date +%H:%M:%S)" >> $LOG
timeout 900 python benchmarks/r2/measure_r2.py probe >> $LOG 2>&1 || exit 1
for job in "ablate micro2" "m groupby" "m sortmerge_small" "m join_small" "m sortmerge" "m join"; do
  set -- $job
  echo "--- $2 $(date +%H:%M:%S)" >> $LOG
  if [ "$1" = ablate ]; then
    timeout 1500 python benchmarks/r2/ablate_v4.py $2 >> $LOG 2>&1
  else
    timeout 1800 python benchmarks/r2/measure_r2.py $2 >> $LOG 2>&1
  fi
  echo "--- $2 rc=$? $(date +%H:%M:%S)" >> $LOG
done
echo "=== q3 done $(date +%H:%M:%S)" >> $LOG
