#!/bin/bash
# queue 4: resume q3 after session kill — groupby G1M + join/sortmerge datapoints
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=benchmarks/r2/run_q4.log
echo "=== q4 start $(date +%H:%M:%S)" >> $LOG
echo "--- probe $(date +%H:%M:%S)" >> $LOG
timeout 900 python benchmarks/r2/measure_r2.py probe >> $LOG 2>&1 || exit 1
for job in groupby sortmerge_small join_small sortmerge join; do
  echo "--- $job $(date +%H:%M:%S)" >> $LOG
  timeout 1800 python benchmarks/r2/measure_r2.py $job >> $LOG 2>&1
  echo "--- $job rc=$? $(date +%H:%M:%S)" >> $LOG
done
echo "=== q4 done $(date +%H:%M:%S)" >> $LOG
