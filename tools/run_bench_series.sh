#!/bin/bash
# Round bench series: N canonical full-surface Bench runs + 1 shuffled
# check, each mirrored from /tmp/graft_bench.json. Serial by design
# (shared sbt target/, and the machine must stay quiet for minima).
# Usage: tools/run_bench_series.sh <round> [nruns] [shuffle_seed]
set -u
cd "$(dirname "$0")/.."
R=${1:?round}; N=${2:-7}; SEED=${3:-$R}
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch 'runMain graft.Bench' > "/tmp/bench_r${R}_run$i.log" 2>&1
  cp /tmp/graft_bench.json "/tmp/bench_r${R}_run$i.json" 2>/dev/null
  echo "run $i done $(date +%H:%M:%S) rc=$?"
done
SPARK_GRAFT_BENCH_SHUFFLE=$SEED SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch 'runMain graft.Bench' > "/tmp/bench_r${R}_shuf.log" 2>&1
cp /tmp/graft_bench.json "/tmp/bench_r${R}_shuf.json" 2>/dev/null
echo "shuffled done $(date +%H:%M:%S)"
