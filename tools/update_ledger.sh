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

if [[ $# -ge 1 ]]; then
  # a provided-but-missing log is an ERROR, not a silent fallthrough into
  # a multi-minute sbt test the caller didn't ask for
  [[ -f "$1" ]] || { echo "test log not found: $1" >&2; exit 1; }
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

# Correctness-gate coverage assertion (round-14 verdict ask #8): the newest
# CORRECTNESS_r*.json must hold EXACTLY one row per registered query — a
# query registered but never oracle-checked (or a stale gate file) fails
# the ledger run instead of slipping through. Mid-round lag (a query added
# since the driver's last gate run) is the one legitimate mismatch: set
# GRAFT_LEDGER_ALLOW_LAG=1 to downgrade the failure to a warning.
# Demonstrated failure (real mismatch, 2026-08-15 — m133 registered
# mid-round, CORRECTNESS_r14 still has 175 rows):
#   $ tools/update_ledger.sh /tmp/sbt-test-r15a.log
#   correctness gate CORRECTNESS_r14.json has 175 rows vs 176 registered
#   queries - a registered query is missing from the gate record
#   (exit 1, README/COVERAGE untouched)
CORR_FILE=$(ls -1 CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1 || true)
if [[ -n "$CORR_FILE" ]]; then
  CORR_N=$(python3 -c "import json;print(len(json.load(open('$CORR_FILE'))))")
  if [[ "$CORR_N" != "$QUERIES" ]]; then
    MSG="correctness gate $CORR_FILE has $CORR_N rows vs $QUERIES registered queries - a registered query is missing from the gate record"
    if [[ "${GRAFT_LEDGER_ALLOW_LAG:-0}" == "1" ]]; then
      echo "WARNING (lag allowed): $MSG" >&2
    else
      echo "$MSG" >&2
      echo "(set GRAFT_LEDGER_ALLOW_LAG=1 only for queries added since the last driver gate run)" >&2
      exit 1
    fi
  fi
fi

# Gate artifacts must be COMMITTED at record time (round-16 verdict ask
# #5, two rounds running): BENCH_r16.json untracked and three records
# worktree-modified at judging time meant the judged tree and its gate
# records diverged. A dirty or untracked gate artifact here fails the
# ledger run loudly — commit the records, then run this script on the
# clean tree (its own README/COVERAGE patches are not gate artifacts,
# so there is no self-conflict). GRAFT_LEDGER_ALLOW_LAG=1 downgrades to
# a warning for the same mid-round window as the count check above.
# (COPYCHECK.json is deliberately absent: it is .gitignore'd as a
# driver-owned per-round artifact, and `git status --porcelain` never
# reports ignored files — listing it here would be dead code.)
DIRTY=$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
  BENCH_REF.json BENCH_LOCAL.json LEAKCHECK.json \
  'BENCH_sf*.json' BENCH_sf1.md 2>/dev/null || true)
if [[ -n "$DIRTY" ]]; then
  if [[ "${GRAFT_LEDGER_ALLOW_LAG:-0}" == "1" ]]; then
    echo "WARNING (lag allowed): gate artifacts dirty/untracked at record time:" >&2
    echo "$DIRTY" >&2
  else
    echo "REFUSE: gate artifacts dirty/untracked at record time — commit them with the round:" >&2
    echo "$DIRTY" >&2
    echo "(set GRAFT_LEDGER_ALLOW_LAG=1 only for a mid-round triage run)" >&2
    exit 1
  fi
fi

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
# The oracle-checked count is NOT derivable from the build (captured-model
# oracle entries only materialize after a Verify run) — it is asserted by
# the correctness gate itself, so this script only updates the QUERY count
# and preserves the hand-verified oracle number; if the two now differ,
# say so instead of silently writing assumed parity.
patch COVERAGE.md \
  '^Current totals: [0-9]+ driver queries, ([0-9]+) oracle hash-checked' \
  "Current totals: $QUERIES driver queries, \\1 oracle hash-checked"
ORACLES=$(grep -oE '^Current totals: [0-9]+ driver queries, [0-9]+ oracle hash-checked' COVERAGE.md |
  grep -oE '[0-9]+' | sed -n 2p)
if [[ "$ORACLES" != "$QUERIES" ]]; then
  echo "WARNING: COVERAGE.md claims $ORACLES oracle-checked vs $QUERIES queries —" >&2
  echo "         run the correctness gate (Verify + tools/oracle_check.py) and update by hand" >&2
fi

echo "ledger: specs=$SPECS queries=$QUERIES oracles=$ORACLES (README.md, COVERAGE.md updated)"
