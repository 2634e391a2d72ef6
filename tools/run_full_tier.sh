#!/bin/bash
# Run the FULL test tier (pytest -m "") one file per process.
#
# Why per-file: a single long pytest process accumulates XLA CPU compile
# state across ~90 tests and has segfaulted mid-suite (rc=139 in
# .hwq_results/pytest_full_tier_r4d.log, in a test that passes in
# isolation). Process isolation bounds that accumulation and makes one
# file's crash visible without killing the rest of the evidence.
#
# Usage: bash tools/run_full_tier.sh [outfile]
set -u
cd "$(dirname "$0")/.."
out="${1:-.hwq_results/pytest_full_tier_$(date +%m%d_%H%M).log}"
: > "$out"
fail=0
for f in tests/test_*.py; do
  echo "== $f" | tee -a "$out"
  timeout 1800 python -m pytest "$f" -q -m "" 2>&1 | tail -3 | tee -a "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "== $f FAILED rc=$rc" | tee -a "$out"
    fail=1
  fi
done
if [ "$fail" -eq 0 ]; then
  echo "== FULL TIER GREEN (per-file)" | tee -a "$out"
else
  echo "== FULL TIER HAS FAILURES" | tee -a "$out"
fi
exit $fail
