"""Per-step incremental-sort corruption diagnostic.

Runs the scene with params.sort_incremental and fetches diagnostics EVERY
step (slow — that is the point), printing the per-step sort-overflow delta,
window truncation, and rho_max. Pinpoints exactly which step corrupts:
round 4 found the prepare()->step-1 transition fired ~219k phantom crossers
(cross-program cell-binning disagreement); after the keep_layout fix step 1
must take the full-sort path and every later step's delta must be 0.

Usage: python tools/inc_sort_diag.py [--scene data/scenes/large_scale_dfsph.json] [--steps 30]
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/scenes/large_scale_dfsph.json")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--warm", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sph_project_tpu.scene import load_scene
    from sph_project_tpu import sim as simlib

    scene, state = load_scene(args.scene)
    scene.params = dataclasses.replace(
        scene.params, sort_incremental=True,
        dfsph_warm_start=bool(args.warm))
    sim = simlib.Simulation(scene, state)
    print(f"# n_pad={sim.params.n_pad} inc-sort diag, {args.steps} steps")
    prev_acc = 0
    for k in range(args.steps):
        diag = sim.step()
        acc = int(diag.get("sort_overflow_acc", diag.get("sort_overflow", 0)))
        delta = acc - prev_acc
        prev_acc = acc
        inc = int(diag.get("sort_overflow_inc", -1))
        wov = int(diag.get("window_overflow_max", 0))
        rho = float(diag.get("density_max", float("nan")))
        di = int(diag.get("solver_iters", 0))
        crossers = int(diag.get("sort_crossers", -1))
        taken = int(diag.get("sort_inc_taken", -1))
        if delta or k % 10 == 0 or k < 3 or not taken:
            print(f"step {k:3d}: sort_ovf +{delta:8d} (acc {acc:9d}, "
                  f"inc-component this step {inc})  "
                  f"crossers {crossers:8d} inc_taken {taken}  "
                  f"win_ovf_max {wov:7d}  rho_max {rho:8.1f}  iters {di}",
                  flush=True)
    ok = prev_acc == 0
    print(f"# RESULT: {'CLEAN' if ok else 'CORRUPTED'} "
          f"(total sort overflow {prev_acc})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
