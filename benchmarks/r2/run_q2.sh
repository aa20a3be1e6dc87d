#!/bin/bash
# queue 2: ablation + retries with fixes
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/run_q2.log
echo "=== q2 start $(date +%H:%M:%S)" >> $LOG
echo "--- probe $(date +%H:%M:%S)" >> $LOG
timeout 900 python benchmarks/r2/measure_r2.py probe >> $LOG 2>&1 || exit 1
for job in "ablate micro" "ablate stages" "m variadic" "m groupby" "m join" "m sortmerge" "m broadcast"; do
  set -- $job
  echo "--- $2 $(date +%H:%M:%S)" >> $LOG
  if [ "$1" = ablate ]; then
    timeout 1500 python benchmarks/r2/ablate_v4.py $2 >> $LOG 2>&1
  else
    timeout 1500 python benchmarks/r2/measure_r2.py $2 >> $LOG 2>&1
  fi
  echo "--- $2 rc=$? $(date +%H:%M:%S)" >> $LOG
done
echo "=== q2 done $(date +%H:%M:%S)" >> $LOG
