"""Attribute the nine-rigid scene's cost: contact pass vs corrector iters.

The coupled final_scene1 analogue (coupling_nine_rigid.json) runs ~5x below
the fluid-only headline rate (VERDICT r3 weak #4). Two suspects:
 - the per-body contact-data pass: (C+1)*(1+dim) = 40 extra pair-kernel
   output channels at ~2.4 ms each (rigid/integrator.py:104-153);
 - pileup corrector iterations (9-14 observed vs 3/1 at the headline).

This tool times, in the real step context on hardware:
 1. the full step (warm + cold),
 2. the step with the contact-data pass compiled OUT
    (params.contact_channels=()) — physics drifts without contact, but a
    dozen timed steps give a clean cost delta,
 3. iteration counts per variant.

Usage: python tools/nine_rigid_profile.py [--steps 12] [--settle 60]
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def time_variant(label, params, state0, settle, steps):
    import jax
    import jax.numpy as jnp
    from sph_project_tpu import sim as simlib

    step = simlib._jitted_step(params)
    state = jax.tree.map(jnp.copy, state0)
    diag = None
    for _ in range(3):
        state, diag = step(state)
    float(state.t)
    for _ in range(settle):
        state, diag = step(state)
    float(state.t)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, diag = step(state)
    float(state.t)
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:28s} {dt*1e3:8.1f} ms/step  iters "
          f"{int(diag['solver_iters'])}/{int(diag['div_iters'])}  "
          f"overflow {int(diag['neighbor_overflow'])}", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="data/scenes/coupling_nine_rigid.json")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--settle", type=int, default=60,
                    help="steps before timing so the pileup regime is real")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sph_project_tpu import sim as simlib
    from sph_project_tpu.scene import load_scene
    from sph_project_tpu.core.params import MATERIAL_FLUID

    scene, state = load_scene(args.scene)
    params = scene.params
    n_fluid = sum(o.particle_num for o in scene.objects
                  if o.material == MATERIAL_FLUID)
    print(f"# scene={args.scene} n_pad={params.n_pad} n_fluid={n_fluid} "
          f"channels={len(params.contact_channels)}", flush=True)
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    float(state.t)

    variants = [
        ("cold", params),
        ("warm", dataclasses.replace(params, dfsph_warm_start=True)),
        ("warm+warmdiv", dataclasses.replace(params, dfsph_warm_start=True,
                                             dfsph_warm_start_div=True)),
        ("cold, contact pass OFF",
         dataclasses.replace(params, contact_channels=())),
        ("warm+warmdiv, contact OFF",
         dataclasses.replace(params, contact_channels=(),
                             dfsph_warm_start=True,
                             dfsph_warm_start_div=True)),
    ]
    results = {}
    for label, pv in variants:
        results[label] = time_variant(label, pv, state,
                                      args.settle, args.steps)
    base = results["cold"]
    print(f"# contact-pass cost (cold delta): "
          f"{(base - results['cold, contact pass OFF'])*1e3:.1f} ms/step")
    print(f"# warm-start saving: {(base - results['warm'])*1e3:.1f} ms/step")
    print(f"# warm-div extra saving: "
          f"{(results['warm'] - results['warm+warmdiv'])*1e3:.1f} ms/step")
    best = min(results['warm'], results['warm+warmdiv'])
    print(f"# best fluid-p-steps/s at this regime: {n_fluid / best:.3g}")


if __name__ == "__main__":
    main()
