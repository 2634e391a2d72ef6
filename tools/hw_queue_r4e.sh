#!/bin/bash
# Round-4 session-E hardware queue: recapture the measurement items the
# VM restart killed mid-r4d (sort/env/pass-floor splits + the nine-rigid
# step-bisect), plus the scatter/sort primitive microbench that decides
# how to attack the 217 ms sort+env block.
set -u
LOG=/root/repo/.hwq_results
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue_r4e.log"; }

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4e.log"
  else
    note "FAIL $name (rc=$?) — pausing 3 min for device self-heal"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4e.log"
    sleep 180
  fi
}

# 1. scatter/sort primitive microbench at headline shapes — decides the
#    sort+env attack (scatter hints vs argsort vs boundary+backfill)
run_item scatter_bench_r4e 2400 python -u tools/scatter_bench.py

# 2. sort cost split at the headline scene (argsort vs scans vs permute)
run_item sort_cost_r4e 2400 python -u tools/sort_cost.py --scene data/scenes/large_scale_dfsph.json

# 3. env build cost split (occurrence-table scatters vs the rest)
run_item env_cost_r4e 2400 python -u tools/env_cost.py --scene data/scenes/large_scale_dfsph.json

# 4. per-pass floor refresh with the zero-tile superblock skip in
run_item pass_floor_r4e 2400 python -u tools/pass_floor.py --scene data/scenes/large_scale_dfsph.json

# 5. nine-rigid step-bisect retry (VM restart killed it at stage 3)
run_item step_bisect_nine_rigid_r4e 2400 python -u tools/step_bisect.py --scene data/scenes/coupling_nine_rigid.json

note "QUEUE-R4E DONE"
