#!/bin/bash
# Repeated full-bench runs for min-of-N aggregation (r16 quiet-window
# re-measure, VERDICT next-round #1). Each run's one-line JSON is saved to
# .localdata/bench_runs/<tag>_<i>.json; interleaves 8-core runs so the
# scaling ratios come from the same epoch. Stop with: touch /tmp/bench_farm_stop
set -u
mkdir -p /root/repo/.localdata/bench_runs
cd /root/repo
i=0
while [ ! -f /tmp/bench_farm_stop ] && [ "$i" -lt "${1:-12}" ]; do
  for cpus in 32 32 32 8; do
    [ -f /tmp/bench_farm_stop ] && break
    log=/tmp/bench_farm_run.log
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$cpus \
      python bench.py > "$log" 2>&1
    grep -o '{"metric".*}' "$log" | tail -1 \
      > ".localdata/bench_runs/c${cpus}_$(date +%H%M%S).json"
  done
  i=$((i+1))
done
echo FARM_DONE
