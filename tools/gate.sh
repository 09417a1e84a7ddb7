#!/usr/bin/env bash
# Pre-snapshot green-suite gate.
#
# Run this IMMEDIATELY before any end-of-round / milestone commit:
#
#   tools/gate.sh && git commit ...
#
# It runs the full ScalaTest suite and exits non-zero unless the log ends
# in an unambiguous all-green summary, so a `&&`-chained commit can never
# ship a red tree. Rounds 8 and 9 both shipped a red suite inside the
# final bookkeeping commit because the last test run predated the last
# code change — this makes the check mechanical and fail-closed.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/gate_sbt_test.log
echo "[gate] running full sbt test suite (log: $LOG)..." >&2
sbt -batch test >"$LOG" 2>&1
status=$?
if [ $status -ne 0 ]; then
  echo "[gate] RED — sbt exited $status. Failures:" >&2
  grep -E "\*\*\* FAILED \*\*\*|^\[error\]" "$LOG" | head -20 >&2
  exit 1
fi
if ! grep -qE "Tests: succeeded [0-9]+, failed 0, canceled 0" "$LOG"; then
  echo "[gate] could not confirm a green summary in $LOG — refusing." >&2
  exit 1
fi
echo "[gate] GREEN — $(grep -oE 'Total number of tests run: [0-9]+' "$LOG" | tail -1); safe to commit." >&2
