#!/usr/bin/env bash
# Pre-snapshot green-suite gate.
#
# Run this IMMEDIATELY before any end-of-round / milestone commit:
#
#   tools/gate.sh && git commit ...
#
# It runs the full ScalaTest suite and exits non-zero on any failure, so a
# `&&`-chained commit never ships a red tree. Rounds 8 and 9 both shipped a
# red suite inside the final bookkeeping commit because the last test run
# predated the last code change — this makes the check mechanical.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "[gate] running full sbt test suite..." >&2
if sbt -batch test 2>&1 | tee /tmp/gate_sbt_test.log | grep -qE '^\[error\]|Tests: succeeded [0-9]+, failed [1-9]'; then
  echo "[gate] RED — refusing. See /tmp/gate_sbt_test.log" >&2
  exit 1
fi
if ! grep -qE 'All tests passed|Tests: succeeded [0-9]+, failed 0' /tmp/gate_sbt_test.log; then
  echo "[gate] could not confirm a green suite — refusing. See /tmp/gate_sbt_test.log" >&2
  exit 1
fi
echo "[gate] GREEN — suite passed; safe to commit." >&2
