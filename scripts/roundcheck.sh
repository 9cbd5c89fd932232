#!/bin/bash
# One-command round-close gate (VERDICT r12 next #7): everything the
# driver's correctness pass checks, PLUS the two-JVM estate contention
# invariants (scenarios A–F) that a single-JVM test run cannot see.
# Exit 0 = ship the round; any nonzero step aborts with its name.
#
#   scripts/roundcheck.sh [sfDir]
#
# ~12 min total: compile (~1), verify+oracle at sf0.01 (~4),
# contention A–F (~7). `sbt test` stays the deeper CI layer — this is
# the fast protocol gate the round-close recipe runs every round.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=$(mktemp -d /tmp/roundcheck.XXXXXX)
step() { echo; echo "== roundcheck: $1 =="; }

step "compile"
sbt -batch compile > "$OUT/compile.log" 2>&1 \
  || { tail -20 "$OUT/compile.log"; echo "ROUNDCHECK FAILED: compile"; exit 1; }

step "verify + DuckDB oracle ($SF)"
sbt -batch "runMain graft.Verify $SF $OUT/verify" > "$OUT/verify.log" 2>&1 \
  || { tail -20 "$OUT/verify.log"; echo "ROUNDCHECK FAILED: verify run"; exit 1; }
python3 scripts/check.py "$OUT/verify" "$SF" \
  || { echo "ROUNDCHECK FAILED: oracle compare"; exit 1; }

step "two-JVM estate contention (A-F)"
bash scripts/contention.sh "$OUT/cstore" "$OUT/cout" \
  || { echo "ROUNDCHECK FAILED: contention"; exit 1; }

echo
echo "== roundcheck: ALL GREEN =="
