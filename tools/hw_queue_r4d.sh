#!/bin/bash
# Round-4 session-D hardware queue: validate the HYBRID incremental sort
# (lax.cond full-sort fallback when crossers exceed the budget) on chip,
# then capture the step-bisect attributions the r4c queue missed.
set -u
LOG=/root/repo/.hwq_results
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue_r4d.log"; }

# wait for the r4c queue (pid file) to release the device
if [ -f /tmp/queue_r4c.pid ]; then
  while kill -0 "$(tail -1 /tmp/queue_r4c.pid)" 2>/dev/null; do
    sleep 60
  done
fi
note "r4c queue done — starting r4d"

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4d.log"
  else
    note "FAIL $name (rc=$?) — pausing 3 min for device self-heal"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4d.log"
    sleep 180
  fi
}

# 1. hybrid inc-sort: per-step diag THROUGH the fall (the regime that
#    corrupted r4c's run) — crossers/step, branch taken, overflow must be 0
run_item inc_diag_r4d 4800 python -u tools/inc_sort_diag.py --steps 120

# 2. hybrid inc-sort under the full bench protocol (the r4c failure case)
run_item bench_r4d_warm_inc 3600 python -u bench.py --sort-incremental --settle 250 --verbose

# 3. headline step-bisect: where the remaining 500 ms/step go
run_item step_bisect_headline_r4d 2400 python -u tools/step_bisect.py --scene data/scenes/large_scale_dfsph.json

# 4. nine-rigid step-bisect (r4c's run crashed on an API-drift bug, fixed)
run_item step_bisect_nine_rigid_r4d 2400 python -u tools/step_bisect.py --scene data/scenes/coupling_nine_rigid.json

# 5. sort cost split at the headline scene (argsort vs scans vs permute)
run_item sort_cost_r4d 2400 python -u tools/sort_cost.py --scene data/scenes/large_scale_dfsph.json

# 6. env build cost split (occurrence-table scatters vs the rest)
run_item env_cost_r4d 2400 python -u tools/env_cost.py --scene data/scenes/large_scale_dfsph.json

# 7. per-pass floor refresh with the zero-tile superblock skip in
run_item pass_floor_r4d 2400 python -u tools/pass_floor.py --scene data/scenes/large_scale_dfsph.json

note "QUEUE-R4D DONE"
