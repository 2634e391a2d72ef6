#!/bin/bash
# Round-3 session C queue: the A/Bs and sweeps lost when the previous
# session's /tmp logs were wiped. Tight timeouts, short wedge pauses —
# budget is ~1h of tunnel time total.
set -u
LOG=/root/repo/.hwq_results
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
    note "FAIL $name (rc=$?) — pausing 2 min"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue.log"
    sleep 120
  fi
}

# 1. combined candidate default: warm start + incremental sort at the
#    headline scene (flip bench defaults if this beats 1.67e6)
run_item warm_inc_scene 1500 python bench.py --warm-start --sort-incremental --verbose

# 2. incremental sort alone (attribution)
run_item inc_scene 1500 python bench.py --sort-incremental --verbose

# 3. warm start alone (attribution)
run_item warm_scene 1500 python bench.py --warm-start --verbose

# 4. nine-rigid coupling demo, 300 steps (VERDICT #2 done-criterion)
run_item nine_rigid 2400 python run_simulation.py --scene_file data/scenes/coupling_nine_rigid.json --steps 300 --no-export

# 5. full-scale 2.25M buckling emitter, bounded run (VERDICT #8)
run_item emitter_2p25m 2400 python run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 6. refreshed dragon-bath coupling number after round-3 pass fusions
run_item dragon_bath 1500 python run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

# 7. full-scale implicit-viscosity scene
run_item high_visc 1500 python run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 150 --no-export

# 8. 3D PBF at scale (468k)
run_item pbf_3d 1500 python run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 150 --no-export

note "QUEUE-D DONE"
