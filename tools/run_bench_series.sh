#!/bin/bash
# Round bench series: N canonical full-surface Bench runs + 1 shuffled
# check, each mirrored from /tmp/graft_bench.json. Serial by design
# (shared sbt target/, and the machine must stay quiet for minima).
# A failed run aborts the series: the mirror is removed BEFORE each run
# and its absence (or a nonzero sbt exit) fails loudly, so a crashed
# Bench can never silently duplicate the previous run's artifact into
# the minima series (the degenerate-artifact class bench_adjudicate
# rejects downstream must not be injectable upstream).
# Host telemetry: loadavg + cumulative iowait ticks (/proc/stat cpu
# field 6) are recorded before/after every run into
# /tmp/bench_r<R>_host.log — three rounds argued "host drift" from
# inference; this makes it data to commit alongside the minima.
# Usage: tools/run_bench_series.sh <round> [nruns] [shuffle_seed]
set -u
cd "$(dirname "$0")/.." || exit 1
R=${1:?round}; N=${2:-7}; SEED=${3:-$R}
HOSTLOG="/tmp/bench_r${R}_host.log"

host_line() { # host_line <tag>
  local load iowait
  load=$(cut -d' ' -f1-3 /proc/loadavg)
  iowait=$(awk '/^cpu /{print $6}' /proc/stat)
  echo "$(date +%H:%M:%S) $1 loadavg=$load iowait_ticks=$iowait" >> "$HOSTLOG"
}

one_run() { # one_run <out.json> <log> [env k=v...]
  local out=$1 log=$2; shift 2
  rm -f /tmp/graft_bench.json
  host_line "before $(basename "$out")"
  env "$@" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch 'runMain graft.Bench' > "$log" 2>&1
  local rc=$?
  host_line "after  $(basename "$out")"
  if [ $rc -ne 0 ] || [ ! -f /tmp/graft_bench.json ]; then
    echo "FAILED rc=$rc (no mirror) — see $log" >&2
    return 1
  fi
  cp /tmp/graft_bench.json "$out"
}

: > "$HOSTLOG"
for i in $(seq 1 "$N"); do
  one_run "/tmp/bench_r${R}_run$i.json" "/tmp/bench_r${R}_run$i.log" \
    || { echo "run $i FAILED $(date +%H:%M:%S)"; exit 1; }
  echo "run $i done $(date +%H:%M:%S)"
done
one_run "/tmp/bench_r${R}_shuf.json" "/tmp/bench_r${R}_shuf.log" \
  "SPARK_GRAFT_BENCH_SHUFFLE=$SEED" \
  || { echo "shuffled run FAILED $(date +%H:%M:%S)"; exit 1; }
echo "shuffled done $(date +%H:%M:%S)"
