"""Cost split of the DMA env build (make_dma_env) at scene scale.

The env is a pure function of (cells_sorted, needs_output): coords decode,
occurrence-table scatters + backfill scans, hull reductions, row-slot
enumeration, cluster unions, meta packing. This times the pieces in
isolation to find which dominates the ~74 ms/step (pass_floor round-3
number) — the scatter-min/max into the (ncells+1) table is the prime
suspect (TPU scatter runs at ~0.1-1 us/row in bad lowerings).

Usage: python tools/env_cost.py --scene data/scenes/large_scale_dfsph.json
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.core.params import MATERIAL_NONE
    from sph_project_tpu.ops import neighbors as nblib
    from sph_project_tpu.ops import pair_dma

    if args.scene:
        from sph_project_tpu.scene import load_scene
        scene, state = load_scene(args.scene)
    else:
        scene, state = bench.build_synthetic(args.n)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = simlib._jitted_step(params)
    for _ in range(3):
        state, _ = step(state)
    float(state.t)
    print(f"# n_pad={params.n_pad} num_cells={params.num_cells}")

    def timeit(fn):
        o = fn(state, 0.0)
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        t0 = time.perf_counter()
        for i in range(args.reps):
            o = fn(state, (i + 1) * 1e-9)
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        return (time.perf_counter() - t0) / args.reps

    def sorted_cells(s, eps):
        p = s.particles
        active = p.material != MATERIAL_NONE
        cells = nblib.flat_cell_ids(p.pos + eps, active, params)
        return cells[nblib.plane_padded_permutation(cells, params)]

    @jax.jit
    def cells_only(s, eps):
        return sorted_cells(s, eps)

    @jax.jit
    def occurrence(s, eps):
        cs = sorted_cells(s, eps)
        t_start, t_end = pair_dma._occurrence_table(cs, params.num_cells)
        return t_start

    @jax.jit
    def env_full(s, eps):
        cs = sorted_cells(s, eps)
        prod = s.particles.material != MATERIAL_NONE
        env = pair_dma.make_dma_env(s.particles.pos, cs, params,
                                    needs_output=prod, keep_layout=False)
        return env.meta_pack

    t_c = timeit(cells_only)
    t_o = timeit(occurrence)
    t_e = timeit(env_full)
    print(f"cells + plane-pad perm        {t_c*1e3:7.1f} ms")
    print(f"+ occurrence table            {t_o*1e3:7.1f} ms "
          f"(table alone ~{(t_o-t_c)*1e3:.1f} ms)")
    print(f"+ full env build              {t_e*1e3:7.1f} ms "
          f"(env minus table ~{(t_e-t_o)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
