#!/usr/bin/env bash
# Regenerate the hand-drift-prone ledger numbers in README.md/COVERAGE.md
# from the build itself (round-13 verdict ask #8):
#   - spec total   <- scalatest's "Total number of tests run: N"
#   - query total  <- SparkEntry.queries.size (graft.tools.LedgerCounts)
#
# Usage:
#   tools/update_ledger.sh [path-to-sbt-test-log]
# With no argument it runs `sbt -batch test` itself (minutes); pass the
# log of a test run you already made to reuse it. Exits nonzero if the
# suite failed, a count could not be parsed, or a ledger line no longer
# matches its expected shape (so silent drift in the WORDING is caught
# too, not just in the numbers).
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ $# -ge 1 && -f "${1:-}" ]]; then
  TEST_LOG="$1"
else
  TEST_LOG=$(mktemp /tmp/graft-ledger-test.XXXXXX)
  echo "running sbt test (pass an existing log to skip)..." >&2
  sbt -batch test >"$TEST_LOG" 2>&1 || {
    tail -20 "$TEST_LOG" >&2
    echo "sbt test FAILED — ledger not updated" >&2
    exit 1
  }
fi

grep -q 'All tests passed.' "$TEST_LOG" || {
  echo "test log has no 'All tests passed.' line — ledger not updated" >&2
  exit 1
}
SPECS=$(grep -oE 'Total number of tests run: [0-9]+' "$TEST_LOG" | tail -1 | grep -oE '[0-9]+')
[[ -n "$SPECS" ]] || { echo "could not parse spec total" >&2; exit 1; }

QUERIES=$(sbt -batch "runMain graft.tools.LedgerCounts" 2>/dev/null |
  grep -oE 'graft-ledger queries=[0-9]+' | grep -oE '[0-9]+')
[[ -n "$QUERIES" ]] || { echo "could not parse query count" >&2; exit 1; }

patch() { # patch FILE REGEX REPLACEMENT — demand exactly one matching line
  local file=$1 re=$2 rep=$3
  local hits
  hits=$(grep -cE "$re" "$file" || true)
  [[ "$hits" == 1 ]] || {
    echo "$file: expected exactly 1 line matching /$re/, found $hits — fix the wording or this script" >&2
    exit 1
  }
  sed -i -E "s/$re/$rep/" "$file"
}

patch README.md \
  '^- `sbt test` — [0-9]+ unit\/plan\/golden specs' \
  "- \`sbt test\` — $SPECS unit\/plan\/golden specs"
patch README.md \
  '^- Current gate status: all [0-9]+ driver queries hash-match' \
  "- Current gate status: all $QUERIES driver queries hash-match"
patch COVERAGE.md \
  '^Current totals: [0-9]+ driver queries, [0-9]+ oracle hash-checked' \
  "Current totals: $QUERIES driver queries, $QUERIES oracle hash-checked"

echo "ledger: specs=$SPECS queries=$QUERIES (README.md, COVERAGE.md updated)"
