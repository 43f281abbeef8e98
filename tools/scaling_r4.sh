#!/usr/bin/env bash
# Round-4 scaling evidence queue (VERDICT r3 item 1): the pending
# conservative 2→8-core pair with EQUAL executor shape at both levels —
# 2-core workers with identical per-worker memory (1 worker vs 4 workers),
# inside this box's linear-hardware region (MemBandwidth 4→16 = 1.02).
# Production layout (delta commits + bucketed staging + bloom seen set),
# 10M pages / 2.5M-URL round budget, 5 interleaved draws, ambient probe per
# level. Afterwards: 5 same-binary Bench reps at sf0.1 for the q1/topk
# draw-noise attribution (VERDICT r3 item 7).
set -euo pipefail
cd "$(dirname "$0")/.."
# the scaling config runs in a SUBSHELL: exporting it at the top level
# leaked SPARK_GRAFT_BENCH_* into the bench reps below, which then measured
# the 10M delta+bucketed config instead of the driver default (round-4
# VERDICT wrong #2 — the contaminated reps are quarantined in
# bench/r4/bench_reps_envleak_10M.jsonl)
(
  export SPARK_GRAFT_CLUSTER=1
  export SPARK_GRAFT_CORES_PER_WORKER=2
  export SPARK_GRAFT_WORKER_MEM_MB=10240
  export SPARK_GRAFT_EXEC_MEM=8g
  export SPARK_GRAFT_BENCH_PAGES=10000000
  export SPARK_GRAFT_BENCH_BUDGET=2500000
  export SPARK_GRAFT_BENCH_ROUNDS=3
  export SPARK_GRAFT_BENCH_TEXT_REPEAT=16
  export SPARK_GRAFT_BENCH_LAYOUT=delta
  export SPARK_GRAFT_BENCH_STAGING=bucketed
  export SPARK_GRAFT_BENCH_SEEN=1
  SPARK_GRAFT_SCALING_OUT=target/scaling_r4 bash tools/scaling_multi.sh 2 8 "${1:-5}"
)

mkdir -p target
# belt-and-braces: even if the CALLER exported a scaling config, the reps
# below must measure the driver default
unset $(env | grep -o '^SPARK_GRAFT_BENCH[A-Z_]*') 2>/dev/null || true
unset SPARK_GRAFT_CLUSTER SPARK_GRAFT_CORES_PER_WORKER SPARK_GRAFT_WORKER_MEM_MB SPARK_GRAFT_EXEC_MEM 2>/dev/null || true
: > target/bench_reps_r4.jsonl
for i in 1 2 3 4 5; do
  echo "[bench-reps] rep $i / 5 (sf0.1, local[32])..."
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 \
    | grep -o '{"metric":"total".*}' >> target/bench_reps_r4.jsonl || true
done
cat target/bench_reps_r4.jsonl
