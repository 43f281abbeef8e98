#!/usr/bin/env bash
# Two-parallelism scaling evidence (north rule: efficiency >= 0.8 from N to
# 4N). Each level runs in its own JVM; results + efficiency appended to
# BENCH.md by tools/scaling_report.py.
set -euo pipefail
cd "$(dirname "$0")/.."
LOW="${1:-8}"
HIGH="${2:-32}"
OUT=target/scaling
mkdir -p "$OUT"
export SPARK_GRAFT_TMPDIR="${SPARK_GRAFT_TMPDIR:-/dev/shm/graft-scaling}"
mkdir -p "$SPARK_GRAFT_TMPDIR"
trap 'rm -rf "$SPARK_GRAFT_TMPDIR"' EXIT
if [ "${SPARK_GRAFT_CLUSTER:-}" = "1" ]; then
  # multi-executor-JVM mode needs the packaged library on spark.jars and
  # a Spark dist for the executor launcher
  export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
  export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
  sbt -batch package >/dev/null
fi
for c in "$LOW" "$HIGH"; do
  echo "[scaling] running local[$c]..."
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
    sbt -batch "runMain graft.ScalingBench $c" 2>&1 \
    | grep -o '{"metric":"scaling_level".*}' > "$OUT/level_$c.json"
  cat "$OUT/level_$c.json"
  rm -rf "$SPARK_GRAFT_TMPDIR"/*
done
python3 tools/scaling_report.py "$OUT/level_$LOW.json" "$OUT/level_$HIGH.json"
