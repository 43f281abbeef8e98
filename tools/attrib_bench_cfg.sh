#!/usr/bin/env bash
# Round-5 attribution of the driver-config crawl elevation: the 5-rep
# final-binary spread (bench/r5/bench_reps_final_binary.jsonl) put
# crawl_rounds at 63.4 s median -- above both the round-4 8-rep spread
# (46.1-49.8) and the r3-vs-r4 order-study window (50-51 s) -- while
# q1_pricing stayed inside its committed spread. The barrier-cut commit
# (981d723) touched exactly the crawl path, so this cannot be written off
# as window noise without an in-window test. This script provides it: the
# pre-barrier-cut binary (17ac755, worktree .wt/r4) and the current binary
# run ALTERNATELY at the DRIVER config (sf0.1, local[32], default Bench
# env), in-pair order flipped across reps so the first-position cost the
# order study documented cancels.
# Usage: tools/attrib_bench_cfg.sh [reps-per-side] [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
REPS="${1:-4}"
OUT="${2:-target/attrib_bench_cfg}"
mkdir -p "$OUT"
: > "$OUT/pre.jsonl"
: > "$OUT/post.jsonl"
run_side() { # side dir
  local side="$1" dir="$2"
  echo "[attrib-cfg] rep $i/$REPS, binary $side..."
  (cd "$dir" && env -u SPARK_GRAFT_BENCH_PAGES -u SPARK_GRAFT_BENCH_BUDGET \
      -u SPARK_GRAFT_BENCH_ROUNDS -u SPARK_GRAFT_BENCH_TEXT_REPEAT \
      -u SPARK_GRAFT_BENCH_LAYOUT -u SPARK_GRAFT_BENCH_STAGING \
      -u SPARK_GRAFT_BENCH_SEEN -u SPARK_GRAFT_CLUSTER \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>&1 \
    | grep -o '{"metric":"total".*}') >> "$OUT/$side.jsonl" || true
}
# pre-build both sides so compile time never lands inside a measured window
(cd .wt/r4 && sbt -batch package >/dev/null)
sbt -batch package >/dev/null
for i in $(seq 1 "$REPS"); do
  if [ $((i % 2)) -eq 1 ]; then
    run_side pre .wt/r4; run_side post .
  else
    run_side post .; run_side pre .wt/r4
  fi
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
data = {}
for side in ("pre", "post"):
    rows = [json.loads(l) for l in open(f"{out}/{side}.jsonl") if l.strip()]
    data[side] = rows
queries = sorted(data["pre"][0]["queries"]) if data["pre"] else []
print(f"{'query':22s} {'pre median (min-max)':>26s} {'post median (min-max)':>26s} {'post/pre':>8s}")
for q in queries + ["__total__"]:
    vals = {}
    for side in ("pre", "post"):
        xs = [r["value"] if q == "__total__" else r["queries"][q] for r in data[side]]
        vals[side] = (statistics.median(xs), min(xs), max(xs))
    mp, lop, hip = vals["pre"]; mq, loq, hiq = vals["post"]
    print(f"{q:22s} {mp:8.2f} ({lop:.2f}-{hip:.2f})      {mq:8.2f} ({loq:.2f}-{hiq:.2f})      {mq/mp:6.2f}")
EOF
