#!/bin/bash
# Round-5 session-A queue: fresh attribution of the settled headline step
# (post r4f sort rebuild + r4g carryovers) before the roofline work.
set -u
cd "$(dirname "$0")/.."
R=.hwq_results
run() {
  name=$1; shift
  echo "== $name: $*"
  timeout 2400 "$@" 2>&1 | tee "$R/$name.log" | grep -v WARNING | tail -6
}
run step_bisect_headline_r5a python tools/step_bisect.py --scene data/scenes/large_scale_dfsph.json
run pass_floor_r5a python tools/pass_floor.py --scene data/scenes/large_scale_dfsph.json
run bench_r5a_warm python bench.py --verbose
