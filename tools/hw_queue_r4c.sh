#!/bin/bash
# Round-4 session-C hardware queue: validate the keep_layout inc-sort fix
# and the zero-tile superblock skip FIRST (they change every subsequent
# number), then the DT A/B, then the evidence sweep on the improved engine.
set -u
LOG=/root/repo/.hwq_results
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue_r4c.log"; }

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4c.log"
  else
    note "FAIL $name (rc=$?) — pausing 3 min for device self-heal"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4c.log"
    sleep 180
  fi
}

# 0. object-table gather/reduce microbench (nine-rigid residual suspects)
run_item obj_gather_bench_r4c 1200 python -u tools/obj_gather_bench.py

# 1. inc-sort keep_layout fix: per-step overflow diagnostic (30 steps)
run_item inc_diag_r4c 2400 python -u tools/inc_sort_diag.py --steps 30

# 2. DMA tile width A/B with the superblock skip in
run_item engine_ab_r4c 3600 python -u tools/engine_ab.py --dts 512,1024

# 3. headline bench, warm (superblock skip vs the committed 1.92e6)
run_item bench_r4c_warm 3600 python -u bench.py --settle 250 --verbose

# 4. headline bench, warm + incremental sort (if item 1 came back clean)
run_item bench_r4c_warm_inc 3600 python -u bench.py --sort-incremental --settle 250 --verbose

# 5. nine-rigid in-context stage bisect (VERDICT #4 attribution)
run_item nine_rigid_bisect_r4c 2400 python -u tools/step_bisect.py --scene data/scenes/coupling_nine_rigid.json

# 6. nine-rigid publishable number under the bench protocol
run_item nine_rigid_bench_r4c 3600 python -u bench.py --scene data/scenes/coupling_nine_rigid.json --settle 150 --verbose

# 7. final_scene2 class: FluidBodies bunny + implicit CG at full scale
run_item high_visc_bunny_r4c 2400 python -u run_simulation.py --scene_file data/scenes/high_viscosity_bunny.json --steps 150 --no-export

# 8. full-scale high-viscosity implicit (emitter class)
run_item high_visc_implicit_r4c 2400 python -u run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 150 --no-export

# 9. 2.25M emitter, bounded run
run_item emitter_2p25m_r4c 2400 python -u run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 10. dragon-bath refresh
run_item dragon_bath_r4c 1800 python -u run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

# 11. 3D PBF at scale (468k)
run_item pbf_3d_r4c 1800 python -u run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 150 --no-export

note "QUEUE-R4C DONE"
