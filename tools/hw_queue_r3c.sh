#!/bin/bash
# Round-3 session B follow-up queue: attribution + scene coverage.
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

# step-stage bisection at the headline scene: attributes the remaining gap
run_item bisect_scene 5400 python tools/step_bisect.py --scene data/scenes/large_scale_dfsph.json --reps 4

# full-scale implicit-viscosity scene (ROADMAP scene coverage)
run_item high_visc 5400 python run_simulation.py --scene_file data/scenes/high_viscosity_implicit.json --steps 200 --no-export

# 3D PBF at scale (468k)
run_item pbf_3d 5400 python run_simulation.py --scene_file data/scenes/pbf_3d.json --steps 200 --no-export

note "QUEUE-C DONE"
