#!/bin/bash
# Scaling-matrix bench: 3 independent JVM invocations per parallelism
# level, best-of-3 reps inside each (SPARK_GRAFT_BENCH_REPS), queries
# skipped (throughput only). First run stages the amplified corpus.
set -u
AMP="${SPARK_GRAFT_AMPLIFY:-1024}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUTDIR="${1:-BENCH}"
mkdir -p "$OUTDIR"
for CPUS in 4 8 16 32; do
  best=""
  for inv in 1 2 3; do
    line=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=$CPUS \
      SPARK_GRAFT_AMPLIFY=$AMP SPARK_GRAFT_BENCH_REPS=3 \
      SPARK_GRAFT_SKIP_QUERIES=1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}')
    echo "$line" > "$OUTDIR/bench${AMP}_cpus${CPUS}_inv${inv}.json"
    echo "cpus=$CPUS inv=$inv: $line"
  done
done
