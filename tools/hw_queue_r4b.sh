#!/bin/bash
# Round-4 session-B hardware queue. Logs land in .hwq_results/ (tracked).
# Item 1 validates the cell-binning rounding-barrier fix for the
# incremental sort at the headline scene (the r4a run corrupted via
# phantom crossers; the barrier pins one rounding across programs and the
# new state accumulators make any step-0 overflow visible). Then the
# nine-rigid attribution + the evidence sweep (VERDICT #2/#4/#6).
set -u
LOG=/root/repo/.hwq_results
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue_r4b.log"; }

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4b.log"
  else
    note "FAIL $name (rc=$?) — pausing 3 min for device self-heal"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4b.log"
    sleep 180
  fi
}

# 1. incremental sort re-validation after the rounding-barrier fix
run_item bench_r4b_warm_inc 3600 python -u bench.py --sort-incremental --settle 250 --verbose

# 2. nine-rigid cost attribution: contact pass vs corrector iters vs warm-div
run_item nine_rigid_profile_r4 2400 python -u tools/nine_rigid_profile.py

# 3. nine-rigid publishable number under the bench protocol
run_item nine_rigid_bench_r4 3000 python -u bench.py --scene data/scenes/coupling_nine_rigid.json --settle 150 --verbose

# 4. final_scene2 class: FluidBodies bunny + implicit CG at full scale
run_item high_visc_bunny_r4 2400 python -u run_simulation.py --scene_file data/scenes/high_viscosity_bunny.json --steps 150 --no-export

# 5. full-scale high-viscosity implicit (emitter class)
run_item high_visc_implicit_r4 1800 python -u run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 150 --no-export

# 6. 2.25M emitter, bounded run
run_item emitter_2p25m_r4 2400 python -u run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 7. dragon-bath refresh
run_item dragon_bath_r4 1800 python -u run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

# 8. 3D PBF at scale (468k)
run_item pbf_3d_r4 1800 python -u run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 150 --no-export

note "QUEUE-R4B DONE"
