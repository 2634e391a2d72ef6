#!/bin/bash
# Round-3 session B queue: prioritized for ~1h of tunnel time.
set -u
LOG=/tmp/hwq
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue.log"; }

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue.log"
  else
    note "FAIL $name (rc=$?) — pausing 10 min for wedge recovery"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue.log"
    sleep 600
  fi
  mkdir -p /root/repo/.hwq_results
  cp "$LOG/$name.log" "$LOG/queue.log" /root/repo/.hwq_results/ 2>/dev/null
}

# 1. sanity at 400k: validates flat-DMA tile list + occupied-row windows on silicon
run_item sanity_400k 2400 python bench.py --n 400000 --settle 0 --reps 2 --verbose

# 2. headline scene settled bench (BENCH_r03 baseline config)
run_item bench_scene 5400 python bench.py --verbose

# 3. warm-start A/B at the headline scene
run_item warm_scene 5400 python bench.py --warm-start --verbose

# 4. combined candidate default: warm start + incremental sort
run_item warm_inc_scene 5400 python bench.py --warm-start --sort-incremental --verbose

# 5. incremental sort alone
run_item inc_scene 5400 python bench.py --sort-incremental --verbose

# 6. nine-rigid coupling demo, 300 steps (VERDICT #2 done-criterion)
run_item nine_rigid 7200 python run_simulation.py --scene_file data/scenes/coupling_nine_rigid.json --steps 300 --no-export

# 7. full-scale 2.25M buckling emitter, bounded run (VERDICT #8)
run_item emitter_2p25m 7200 python run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 8. refreshed dragon-bath coupling number
run_item dragon_bath 5400 python run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

note "QUEUE DONE"
