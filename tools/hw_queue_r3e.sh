#!/bin/bash
# Round-3 session C queue, reordered after warm_inc_scene's result:
# incremental sort overflows its crosser budget at the headline scene
# (sort overflow 339, rho_max=0 — corrupted), so the warm-only bench is
# the publishable candidate; inc-sort is pulled for diagnosis.
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

# 1. warm start alone at the headline scene: the publishable candidate
run_item warm_scene 1800 python bench.py --warm-start --verbose

# 2. nine-rigid coupling demo, 300 steps (VERDICT #2 done-criterion)
run_item nine_rigid 2400 python run_simulation.py --scene_file data/scenes/coupling_nine_rigid.json --steps 300 --no-export

# 3. full-scale 2.25M buckling emitter, bounded run (VERDICT #8)
run_item emitter_2p25m 2400 python run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 4. refreshed dragon-bath coupling number after round-3 pass fusions
run_item dragon_bath 1500 python run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

# 5. full-scale implicit-viscosity scene
run_item high_visc 1500 python run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 150 --no-export

# 6. 3D PBF at scale (468k)
run_item pbf_3d 1500 python run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 150 --no-export

note "QUEUE-E DONE"
