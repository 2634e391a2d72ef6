#!/bin/bash
# Round-4 session-F hardware queue: validate the scan-based
# plane_padded_permutation (114.5 ms table chain -> target ~45 ms) —
# sort-cost split A/B, headline warm + cold benches, nine-rigid bench.
# Waits for the r4e queue (if still running) before touching the device.
set -u
LOG=/root/repo/.hwq_results
mkdir -p "$LOG"
cd /root/repo

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue_r4f.log"; }

# wait (up to 40 min) for the r4e queue to release the device
for i in $(seq 240); do
  if ! pgrep -x -f "bash tools/hw_queue_r4e.sh" > /dev/null 2>&1; then break; fi
  sleep 10
done
note "r4e queue clear; starting r4f"

run_item() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    note "OK $name"
    tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4f.log"
  else
    note "FAIL $name (rc=$?) — pausing 3 min for device self-heal"
    tail -5 "$LOG/$name.log" | sed 's/^/    /' | tee -a "$LOG/queue_r4f.log"
    sleep 180
  fi
}

# 1. sort cost split with the scan-based permutation (A/B vs sort_cost_r4e)
run_item sort_cost_r4f 2400 python -u tools/sort_cost.py --scene data/scenes/large_scale_dfsph.json

# 2. headline warm bench (the driver-protocol number)
run_item bench_r4f_warm 4800 python -u bench.py

# 3. headline cold bench (reference-algorithm operating point)
run_item bench_r4f_cold 4800 python -u bench.py --cold

# 4. nine-rigid bench refresh (sort+env was 120 ms of its step too)
run_item bench_r4f_nine_rigid 4800 python -u bench.py --scene data/scenes/coupling_nine_rigid.json --settle 150

# 5. env cost refresh (occurrence table share after the perm rewrite)
run_item env_cost_r4f 2400 python -u tools/env_cost.py --scene data/scenes/large_scale_dfsph.json

note "QUEUE-R4F DONE"
