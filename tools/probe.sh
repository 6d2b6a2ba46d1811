#!/bin/bash
# Isolated paired-probe runner (round 17): times a comma-separated query list
# with fixed-N runs in one fresh JVM, floors masked off, no chunking — the
# r16 probe discipline. Usage: tools/probe.sh q_a,q_b [runs] [sfdir]
# Prints the one-line JSON artifact to stdout (grep '"metric"').
set -u
QUERIES="$1"
RUNS="${2:-9}"
SF="${3:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
SPARK_GRAFT_BENCH_RUNS="$RUNS" \
SPARK_GRAFT_BENCH_CHUNKS=1 \
SPARK_GRAFT_BENCH_REF=/dev/null \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_SF_DIR="$SF" \
sbt "runMain graft.Bench" 2>&1 | grep -E '"metric"|BENCH (FAIL|SENTINEL)'
