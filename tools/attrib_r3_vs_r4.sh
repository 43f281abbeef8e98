#!/usr/bin/env bash
# Round-5 attribution of the round-4 driver-bench regression (round-4
# VERDICT wrong #1): BENCH_r04's draw ran +10-25% slower than BENCH_r03
# across EVERY query, including q1_pricing which touches zero round-4 code.
# Round 4 claimed "ambient window" but had no interleaved measurement to
# back it. This script provides it: the round-3-end binary (ce7fa8e) and
# the round-4-end binary (17ac755) built in pinned worktrees (.wt/r3,
# .wt/r4), run ALTERNATELY in the same window on the same input
# (sf0.1, driver-default config), N reps each. If the two binaries match
# within the in-window spread while both sit above/below the committed
# r3/r4 draws, the regression was the measurement window, not code.
set -euo pipefail
cd "$(dirname "$0")/.."
REPS="${1:-4}"
OUT="${2:-target/attrib_r3_vs_r4}"
mkdir -p "$OUT"
: > "$OUT/r3.jsonl"
: > "$OUT/r4.jsonl"
for i in $(seq 1 "$REPS"); do
  for side in r4 r3; do
    echo "[attrib] rep $i/$REPS, binary $side..."
    (cd ".wt/$side" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>&1 \
      | grep -o '{"metric":"total".*}') >> "$OUT/$side.jsonl" || true
  done
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
data = {}
for side in ("r3", "r4"):
    rows = [json.loads(l) for l in open(f"{out}/{side}.jsonl") if l.strip()]
    data[side] = rows
queries = sorted(data["r3"][0]["queries"]) if data["r3"] else []
print(f"{'query':22s} {'r3 median (min-max)':>26s} {'r4 median (min-max)':>26s} {'r4/r3':>6s}")
for q in queries + ["__total__"]:
    vals = {}
    for side in ("r3", "r4"):
        xs = [r["value"] if q == "__total__" else r["queries"][q] for r in data[side]]
        vals[side] = (statistics.median(xs), min(xs), max(xs))
    m3, lo3, hi3 = vals["r3"]; m4, lo4, hi4 = vals["r4"]
    print(f"{q:22s} {m3:8.2f} ({lo3:.2f}-{hi3:.2f})      {m4:8.2f} ({lo4:.2f}-{hi4:.2f})      {m4/m3:5.2f}")
EOF
