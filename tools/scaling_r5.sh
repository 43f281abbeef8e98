#!/usr/bin/env bash
# Round-5 scaling evidence: the same conservative 2→8-core equal-shape
# protocol as round 4 (tools/scaling_r4.sh), now measuring the round-5
# binary (selectedCount derived from rank counts — one fewer serial job
# per round — and the seen-shard write running concurrently with the
# commit's table writes). Usage:
#   tools/scaling_r5.sh [draws]        # standard 10M/2.5M draws
#   tools/scaling_r5.sh big            # one 20M/5M draw: tests the round-4
#     evlog decomposition's PREDICTION that the wall-vs-CPU gap is a
#     fixed-cost artifact (constant driver planning + small-stage wave
#     quantization) — at 2x the round size the constant terms halve as a
#     fraction of the round, so wall efficiency must rise toward the
#     CPU-normalized number. If it doesn't, the decomposition was wrong.
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-3}"
(
  export SPARK_GRAFT_CLUSTER=1
  export SPARK_GRAFT_CORES_PER_WORKER=2
  export SPARK_GRAFT_WORKER_MEM_MB=10240
  export SPARK_GRAFT_EXEC_MEM=8g
  export SPARK_GRAFT_BENCH_ROUNDS=3
  export SPARK_GRAFT_BENCH_TEXT_REPEAT=16
  export SPARK_GRAFT_BENCH_LAYOUT=delta
  export SPARK_GRAFT_BENCH_STAGING=bucketed
  export SPARK_GRAFT_BENCH_SEEN=1
  if [ "$MODE" = "big" ]; then
    export SPARK_GRAFT_BENCH_PAGES=20000000
    export SPARK_GRAFT_BENCH_BUDGET=5000000
    SPARK_GRAFT_SCALING_OUT=target/scaling_r5_big bash tools/scaling_multi.sh 2 8 1
  else
    export SPARK_GRAFT_BENCH_PAGES=10000000
    export SPARK_GRAFT_BENCH_BUDGET=2500000
    SPARK_GRAFT_SCALING_OUT=target/scaling_r5 bash tools/scaling_multi.sh 2 8 "$MODE"
  fi
)
