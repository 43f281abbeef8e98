#!/usr/bin/env bash
# Round-5 attribution of the scaling-level throughput gain: the round-5
# quiet-window draws set new bests at BOTH levels (15.4-15.6k urls/s at 2
# cores, 39.6-39.7k at 8) vs round 4's bests (13.7k / 36.5k), the expected
# direction of the barrier-cut commit (981d723: selectedCount derived from
# rank counts instead of a fetched.count() job; seen-shard write overlapped
# with commit writes) -- but those are cross-window comparisons, and this
# project's own order study showed ~10-15% window artifacts. This script
# provides the in-window evidence: the pre-barrier-cut binary (17ac755,
# worktree .wt/r4) and the current binary run ALTERNATELY at the same
# ScalingBench level in one window, fresh JVM per run, production config
# (delta + bucketed + seen, 10M pages / 2.5M budget, equal 2-core shape).
# Usage: tools/attrib_barrier_cut.sh [reps-per-side] [level] [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
REPS="${1:-3}"
LEVEL="${2:-8}"
OUT="${3:-target/attrib_barrier_cut_l$LEVEL}"
mkdir -p "$OUT"
: > "$OUT/pre.jsonl"
: > "$OUT/post.jsonl"
export SPARK_GRAFT_TMPDIR="${SPARK_GRAFT_TMPDIR:-/dev/shm/graft-attrib}"
mkdir -p "$SPARK_GRAFT_TMPDIR"
trap 'rm -rf "$SPARK_GRAFT_TMPDIR"' EXIT
run_side() { # side dir
  local side="$1" dir="$2"
  echo "[attrib-barrier] rep $i/$REPS, level local[$LEVEL], binary $side..."
  (
    cd "$dir"
    export SPARK_GRAFT_CLUSTER=1 SPARK_GRAFT_CORES_PER_WORKER=2
    export SPARK_GRAFT_WORKER_MEM_MB=10240 SPARK_GRAFT_EXEC_MEM=8g
    export SPARK_GRAFT_BENCH_PAGES=10000000 SPARK_GRAFT_BENCH_BUDGET=2500000
    export SPARK_GRAFT_BENCH_ROUNDS=3 SPARK_GRAFT_BENCH_TEXT_REPEAT=16
    export SPARK_GRAFT_BENCH_LAYOUT=delta SPARK_GRAFT_BENCH_STAGING=bucketed
    export SPARK_GRAFT_BENCH_SEEN=1
    export SPARK_HOME="${SPARK_HOME:-/opt/spark}" SPARK_SCALA_VERSION=2.13
    SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScalingBench $LEVEL" 2>&1 \
      | grep -o '{"metric":"scaling_level".*}'
  ) >> "$OUT/$side.jsonl" || true
  rm -rf "$SPARK_GRAFT_TMPDIR"/*
}
# pre-build both sides so compile time never lands inside a measured window
(cd .wt/r4 && sbt -batch package >/dev/null)
sbt -batch package >/dev/null
for i in $(seq 1 "$REPS"); do
  # alternate in-pair order across reps so a first-position cost cancels
  if [ $((i % 2)) -eq 1 ]; then
    run_side pre .wt/r4; run_side post .
  else
    run_side post .; run_side pre .wt/r4
  fi
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
for side in ("pre", "post"):
    rows = [json.loads(l) for l in open(f"{out}/{side}.jsonl") if l.strip()]
    tp = [r["urls_per_sec"] for r in rows]
    cpu = [r["fetches"] / r["executor_cpu_sec"] for r in rows]
    amb = [r["ambient_gbps"] for r in rows]
    if tp:
        print(f"{side:5s} urls/s median {statistics.median(tp):9,.0f} "
              f"({min(tp):,.0f}-{max(tp):,.0f})  urls/CPU-s median "
              f"{statistics.median(cpu):7,.0f} ({min(cpu):,.0f}-{max(cpu):,.0f})  "
              f"ambient {min(amb)}-{max(amb)} GB/s  n={len(tp)}")
EOF
