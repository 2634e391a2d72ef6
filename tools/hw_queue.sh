#!/bin/bash
# Unattended hardware work queue: wait for the tunneled TPU, then run the
# pending round-3 experiments in priority order, logging to /tmp/hwq/.
# Resilient to device wedges: each item is bounded; a failure pauses 15 min
# (the wedge-recovery window) before the next item.
set -u
LOG=/tmp/hwq
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue.log"; }

note "waiting for TPU..."
while true; do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" 2>/dev/null; then
    note "TPU UP"
    break
  fi
  sleep 120
done

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue.log"
  else
    note "FAIL $name (rc=$?) — pausing 15 min for wedge recovery"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue.log"
    sleep 900
  fi
  # persist results into the repo so a later session finds them even if
  # /tmp is cleaned (directory is gitignored-by-absence; never committed
  # automatically)
  mkdir -p /root/repo/.hwq_results
  cp "$LOG/$name.log" "$LOG/queue.log" /root/repo/.hwq_results/ 2>/dev/null
}

# 1. chip + code sanity at 400k (fast; compile mostly cached)
run_item sanity_400k 2400 python bench.py --n 400000 --settle 0 --reps 2 --verbose

# 2. incremental-sort A/B at 400k (new compile)
run_item inc_400k 2400 python bench.py --n 400000 --settle 0 --reps 2 --sort-incremental --verbose

# 3. step-stage bisection at the headline scene (attributes the ~380ms gap)
run_item bisect_scene 5400 python tools/step_bisect.py --scene data/scenes/large_scale_dfsph.json --reps 4

# 4. headline scene settled bench (BENCH_r03 dry run)
run_item bench_scene 5400 python bench.py --verbose

# 5. incremental-sort A/B at the headline scene
run_item inc_scene 5400 python bench.py --sort-incremental --verbose

# 5b. DFSPH warm-start A/B at the headline scene (saves the star0 probe
#     pass + settled corrector iterations; same convergence tolerance)
run_item warm_scene 5400 python bench.py --warm-start --verbose

# 5c. combined candidate default: warm start + incremental sort
run_item warm_inc_scene 5400 python bench.py --warm-start --sort-incremental --verbose

# 6. nine-rigid coupling demo, 300 steps (VERDICT #2 done-criterion)
run_item nine_rigid 7200 python run_simulation.py --scene_file data/scenes/coupling_nine_rigid.json --steps 300 --no-export

# 7. full-scale 2.25M buckling emitter, bounded run (VERDICT #8)
run_item emitter_2p25m 7200 python run_simulation.py --scene_file data/scenes/buckling_emitter.json --steps 100 --no-export

# 7b. refreshed dragon-bath coupling number after round-3 fusions
run_item dragon_bath 5400 python run_simulation.py --scene_file data/scenes/dragon_bath_dfsph.json --steps 120 --no-export

# 8. full-scale implicit-viscosity scene (ROADMAP scene coverage)
run_item high_visc 5400 python run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 200 --no-export

# 9. 3D PBF at scale (468k)
run_item pbf_3d 5400 python run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 200 --no-export

note "QUEUE DONE"
