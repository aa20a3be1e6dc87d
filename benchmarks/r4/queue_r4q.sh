#!/bin/bash
# Round-4 continuation queue 2 (after join100m): the gbengine legs the
# r4o window never reached (scmm G=1M + both aggs at G=100K — resumable,
# the recorded gb4_sum_10M_G1000000 is skipped), a fresh q1 number on
# the post-tail-rewrite engine, then one bench.py run to confirm the
# driver's cold invocation lands warm.
cd /root/repo
probe() { timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(16))))" >/dev/null 2>&1; }
runjob() {
  local name=$1 budget=$2 tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    until probe; do echo "$(date +%H:%M:%S) tunnel wedged; wait"; sleep 120; done
    echo "$(date +%H:%M:%S) START $name (attempt $attempt)"
    if timeout "$budget" "$@"; then echo "$(date +%H:%M:%S) DONE $name"; return 0; fi
    echo "$(date +%H:%M:%S) FAIL $name"; sleep 30
  done
  return 1
}
runjob gbengine 2400 2 python benchmarks/r4/measure_r4.py gbengine
runjob q1_r4 1200 2 python benchmarks/r4/measure_r4.py q1
runjob bench_confirm 600 1 python bench.py
