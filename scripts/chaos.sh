#!/bin/bash
# Executor-loss chaos probe (VERDICT r13 next #1): kill a REAL executor
# JVM mid-job on local-cluster and prove the recovery claims —
#   1. iterative round state through a RELIABLE checkpoint dir survives
#      the loss with a hash-identical result (Checkpoints.stable's
#      cluster posture, exercised under actual loss);
#   2. the same job on localCheckpoint round state documents the
#      DESIGNED failure (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND);
#   3. streaming TextIndex ingest holds exactly-once through Spark task
#      retry alone when an executor dies mid-trigger (+ the same claim
#      for VectorIngest, arm `stream-vec`);
#   4. a mid-visit loss redoes exactly-once through the retry fence
#      (arm `visit`);
#   5. nightly compaction survives a mid-job kill with contents
#      hash-identical (arm `maintenance`).
#
#   scripts/chaos.sh [arms...]     # default: all five
#
# Exit 0 = every hard claim held AND every kill actually landed mid-job
# (a missed race FAILS — no vacuous passes). ~10 min.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=$(mktemp /tmp/chaos.XXXXXX.log)
SPARK_SCALA_VERSION=2.13 sbt -batch "runMain graft.ChaosProbe $*" \
  > "$LOG" 2>&1
rc=$?
grep '\[chaos\]' "$LOG" || true
if [ $rc -ne 0 ]; then
  echo "CHAOS PROBE FAILED (rc=$rc, log: $LOG)"
  tail -30 "$LOG"
  exit 1
fi
grep -q '"probe":"done"' "$LOG" \
  || { echo "CHAOS PROBE FAILED: no done line (log: $LOG)"; exit 1; }
echo "CHAOS PROBE GREEN"
