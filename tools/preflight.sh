#!/usr/bin/env bash
# End-of-round preflight gate — run BEFORE the snapshot commit.
#
# Refuses (non-zero exit) unless ALL of:
#   1. sbt compile          — the tree compiles (r12 shipped a tree that
#                             didn't; this script exists so that cannot
#                             recur)
#   2. sbt test             — full ScalaTest suite green
#   3. graft.Verify sf0.01  — every SparkEntry query dumps its parquet
#   4. tools/check.py       — DuckDB oracle compare: rows + schema +
#                             driver-emulated canonical hash per query,
#                             plus the oracle cost budget (10 s/query,
#                             180 s/suite)
#
# Usage: tools/preflight.sh [--quick]
#   --quick skips sbt test (stages 1,3,4 only) for mid-round iteration;
#   the snapshot commit requires the FULL run.
set -uo pipefail
cd "$(dirname "$0")/.."

QUICK=0
[[ "${1:-}" == "--quick" ]] && QUICK=1

SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT=target/verify_out

fail() { echo "PREFLIGHT: FAIL at stage $1 — do NOT commit the snapshot"; exit 1; }

echo "PREFLIGHT stage 1/4: sbt compile"
sbt -batch compile || fail compile

if [[ $QUICK -eq 0 ]]; then
  echo "PREFLIGHT stage 2/4: sbt test"
  sbt -batch test || fail test
else
  echo "PREFLIGHT stage 2/4: SKIPPED (--quick)"
fi

echo "PREFLIGHT stage 3/4: graft.Verify @ $SF"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" || fail verify

echo "PREFLIGHT stage 4/4: tools/check.py (rows+schema+hash+budget)"
python3 tools/check.py "$SF" "$OUT" || fail check

echo "PREFLIGHT: ALL GREEN — safe to commit the snapshot"
