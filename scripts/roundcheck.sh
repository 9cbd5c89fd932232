#!/bin/bash
# One-command round-close gate (VERDICT r12 next #7): everything the
# driver's correctness pass checks, PLUS the two-JVM estate contention
# invariants (scenarios A–H) that a single-JVM test run cannot see,
# PLUS the executor-loss chaos arms (default on since round 15).
# Exit 0 = ship the round; any nonzero step aborts with its name.
#
#   scripts/roundcheck.sh [sfDir]
#
# ~20 min total: compile (~1), verify+oracle at sf0.01 (~4),
# contention A–H (~8), chaos (~7; ROUNDCHECK_CHAOS=0 skips for quick
# iteration). `sbt test` stays the deeper CI layer — this is the
# protocol gate the round-close recipe runs every round.
# ROUNDCHECK_CLUSTER=1 adds the cross-executor parity arm (+~10 min).
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=$(mktemp -d /tmp/roundcheck.XXXXXX)
step() { echo; echo "== roundcheck: $1 =="; }

step "compile"
# Test/compile too: contention scenario G runs the test-only faulty://
# store (CondBreakProbe) from test-classes
sbt -batch compile Test/compile > "$OUT/compile.log" 2>&1 \
  || { tail -20 "$OUT/compile.log"; echo "ROUNDCHECK FAILED: compile"; exit 1; }

step "verify + DuckDB oracle ($SF)"
sbt -batch "runMain graft.Verify $SF $OUT/verify" > "$OUT/verify.log" 2>&1 \
  || { tail -20 "$OUT/verify.log"; echo "ROUNDCHECK FAILED: verify run"; exit 1; }
python3 scripts/check.py "$OUT/verify" "$SF" \
  || { echo "ROUNDCHECK FAILED: oracle compare"; exit 1; }

step "two-JVM estate contention (A-G)"
bash scripts/contention.sh "$OUT/cstore" "$OUT/cout" \
  || { echo "ROUNDCHECK FAILED: contention"; exit 1; }

# Optional executor-serialization parity arm (ROUNDCHECK_CLUSTER=1,
# +~10 min): rerun Verify across REAL executor JVMs
# (local-cluster[2,8,3072]) and require every key's result parquet to
# hash-identical against the local[32] run above — the round-13 parity
# check as a repeatable gate instead of a one-off.
# Executor-loss chaos arm (DEFAULT ON since round 15 — VERDICT r14
# next #5: a durability layer this load-bearing must not be skippable
# by default; ROUNDCHECK_CHAOS=0 opts out for quick iteration, +~6 min
# when on): kill a real executor JVM mid-job on local-cluster and
# require the recovery claims to hold under ACTUAL loss —
# reliable-checkpoint round state completes hash-identical, streaming
# ingest stays exactly-once through task retry, and the
# localCheckpoint designed failure is documented (VERDICT r13 next #1).
if [ "${ROUNDCHECK_CHAOS:-1}" = "1" ]; then
  step "executor-loss chaos probe (local-cluster)"
  bash scripts/chaos.sh \
    || { echo "ROUNDCHECK FAILED: chaos probe"; exit 1; }
fi

if [ "${ROUNDCHECK_CLUSTER:-0}" = "1" ]; then
  step "cross-executor parity (local-cluster[2,8,3072])"
  SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,3072]' \
    sbt -batch "runMain graft.Verify $SF $OUT/verify_cluster" \
    > "$OUT/verify_cluster.log" 2>&1 \
    || { tail -20 "$OUT/verify_cluster.log"; echo "ROUNDCHECK FAILED: cluster verify"; exit 1; }
  python3 scripts/check.py "$OUT/verify_cluster" "$SF" \
    || { echo "ROUNDCHECK FAILED: cluster oracle compare"; exit 1; }
  python3 scripts/parity.py "$OUT/verify" "$OUT/verify_cluster" \
    || { echo "ROUNDCHECK FAILED: local vs cluster result parity"; exit 1; }
fi

echo
echo "== roundcheck: ALL GREEN =="
# Round-close bench protocol (VERDICT r13 next #6 — the round record
# and the re-measure protocol in one place): Bench self-gates on the
# committed calibration band (bench_record.json) — on a co-loaded host
# it stamps degraded_host:true and runs min-of-3 per key. Flagged-key
# re-measures must be FULL-REGISTRY sweeps (isolated runs read high:
# the shared expression-family warm-up is absent), min-of-3 across
# three sweeps, compared calibration-normalized against the record.
echo
echo "== round record (bench_record.json) =="
cat bench_record.json 2>/dev/null \
  || echo "(no bench_record.json — ad-hoc checkout, Bench gating off)"
echo "re-measure protocol: 3x full-registry sweeps, per-key min-of-3,"
echo "compare calibration-normalized; update bench_record.json only"
echo "from a sweep whose calibration sits inside the committed band."
