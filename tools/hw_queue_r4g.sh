#!/bin/bash
# Session-G hardware queue: re-bench after the CT=256 compute-tile change.
# Results land in .hwq_results/ (tracked) — every README perf row must cite
# a committed log.
set -u
cd "$(dirname "$0")/.."
R=.hwq_results
run() {
  name=$1; shift
  echo "== $name: $*"
  timeout 2400 "$@" 2>&1 | tee "$R/$name.log" | grep -v WARNING | tail -4
}
run bench_r4g_warm      python bench.py
run bench_r4g_cold      python bench.py --cold
run bench_r4g_nine_rigid python bench.py --scene data/scenes/coupling_nine_rigid.json
