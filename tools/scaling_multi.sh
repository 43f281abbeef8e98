#!/usr/bin/env bash
# Multi-draw scaling evidence (round-2 VERDICT item 2): D draws of the
# (LOW, HIGH) ScalingBench pair, every level in its own JVM, draws
# interleaved L,H,L,H,... so a quiet/noisy hypervisor window hits both
# levels of a draw together. tools/scaling_median.py then reports per-draw
# wall-clock AND executor-CPU-seconds-normalized efficiency, with medians.
set -euo pipefail
cd "$(dirname "$0")/.."
LOW="${1:-4}"
HIGH="${2:-16}"
DRAWS="${3:-5}"
OUT="${SPARK_GRAFT_SCALING_OUT:-target/scaling_multi}"
mkdir -p "$OUT"
export SPARK_GRAFT_TMPDIR="${SPARK_GRAFT_TMPDIR:-/dev/shm/graft-scaling}"
mkdir -p "$SPARK_GRAFT_TMPDIR"
trap 'rm -rf "$SPARK_GRAFT_TMPDIR"' EXIT
if [ "${SPARK_GRAFT_CLUSTER:-}" = "1" ]; then
  export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
  export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
  sbt -batch package >/dev/null
fi
for d in $(seq 1 "$DRAWS"); do
  for c in "$LOW" "$HIGH"; do
    echo "[scaling-multi] draw $d / $DRAWS, level local[$c]..."
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
      sbt -batch "runMain graft.ScalingBench $c" 2>&1 \
      | grep -o '{"metric":"scaling_level".*}' > "$OUT/draw${d}_level_$c.json"
    cat "$OUT/draw${d}_level_$c.json"
    rm -rf "$SPARK_GRAFT_TMPDIR"/*
  done
done
python3 tools/scaling_median.py "$LOW" "$HIGH" "$OUT"
