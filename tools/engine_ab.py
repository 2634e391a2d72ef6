"""A/B engine-geometry variants (DMA tile width DT, group G) on real steps.

Times early-fall chunks at the scene for each variant, rebuilding the scene
(su estimate) and re-jitting per variant — the step program bakes the
engine constants at trace time. The per-superblock fixed cost is dominated
by the 2 x ntot DMA issue/wait scalar ops; DT=1024 halves ntot at the cost
of coarser VMEM slot granularity.

Usage: python tools/engine_ab.py [--scene ...] [--dts 512,1024] [--steps 25]
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/scenes/large_scale_dfsph.json")
    ap.add_argument("--dts", default="512,1024")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sph_project_tpu.ops import pair_dma
    from sph_project_tpu.scene import load_scene
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.core.params import MATERIAL_FLUID

    results = {}
    for dt_s in args.dts.split(","):
        dt = int(dt_s)
        pair_dma.DT = dt
        scene, state = load_scene(args.scene)
        scene.params = dataclasses.replace(scene.params,
                                           dfsph_warm_start=True)
        params = scene.params
        n_fluid = sum(o.particle_num for o in scene.objects
                      if o.material == MATERIAL_FLUID)
        prep = jax.jit(lambda s, p=params: simlib.prepare(s, p))
        step = jax.jit(simlib.get_step_fn(params), donate_argnums=0)
        state = prep(state)
        diag = None
        for _ in range(args.warmup):
            state, diag = step(state)
        float(state.t)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, diag = step(state)
            float(state.t)
            times.append(time.perf_counter() - t0)
        ovf = int(diag["sort_overflow_acc"]) if "sort_overflow_acc" in diag \
            else int(diag["neighbor_overflow"])
        best = min(times) / args.steps
        pps = n_fluid / best
        results[dt] = (best, pps, ovf)
        print(f"DT={dt}: su={params.pair_dma_su} step {best*1e3:.1f} ms  "
              f"fluid-p-steps/s {pps:.3g}  sort_ovf_acc {ovf}  "
              f"win_ovf_max {int(diag.get('window_overflow_max', -1))}",
              flush=True)

    base = min(results)
    for dt, (t, pps, _) in sorted(results.items()):
        print(f"# DT={dt}: {pps:.3g} p-steps/s "
              f"({results[base][0] / t:.3f}x vs DT={base})")


if __name__ == "__main__":
    main()
