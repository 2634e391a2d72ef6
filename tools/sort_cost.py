"""Cost split of sort_state at scene scale: argsort vs scans vs permute.

Decides whether an incremental (near-identity) permutation build is worth
replacing the per-step stable argsort (see ROADMAP: incremental sort).

Usage: python tools/sort_cost.py --scene data/scenes/large_scale_dfsph.json
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
    from sph_project_tpu.ops import neighbors as nblib

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
    print(f"# n_pad={params.n_pad}")

    def timeit(fn, reps=args.reps):
        o = fn(state, 0.0)
        float(jnp.sum(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[:1]))
        t0 = time.perf_counter()
        for i in range(reps):
            o = fn(state, (i + 1) * 1e-9)
        float(jnp.sum(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[:1]))
        return (time.perf_counter() - t0) / reps

    from sph_project_tpu.core.params import MATERIAL_NONE

    @jax.jit
    def cells_only(s, eps):
        p = s.particles
        active = p.material != MATERIAL_NONE
        return nblib.flat_cell_ids(p.pos + eps, active, params)

    @jax.jit
    def argsort_only(s, eps):
        return jnp.argsort(cells_only(s, eps), stable=True)

    @jax.jit
    def perm_full(s, eps):
        return nblib.plane_padded_permutation(cells_only(s, eps), params)

    @jax.jit
    def sort_full(s, eps):
        p = s.particles
        s = s.replace(particles=p.replace(pos=p.pos + eps))
        return simlib.sort_state(s, params)[0].particles.pos

    @jax.jit
    def crosser_count(s, eps):
        # how near-identity is the step-to-step permutation really?
        p = s.particles
        active = p.material != MATERIAL_NONE
        kn = nblib.flat_cell_ids(p.pos + eps, active, params)
        ko = nblib.flat_cell_ids(p.pos, active, params)
        return jnp.sum(kn != ko)

    t_c = timeit(cells_only)
    t_a = timeit(argsort_only)
    t_p = timeit(perm_full)
    t_s = timeit(sort_full)
    print(f"flat_cell_ids            {t_c*1e3:7.1f} ms")
    print(f"+ stable argsort         {t_a*1e3:7.1f} ms")
    print(f"+ plane-pad scans (perm) {t_p*1e3:7.1f} ms")
    print(f"sort_state total         {t_s*1e3:7.1f} ms")
    # crossers between consecutive steps: step once, compare
    st2, _ = step(jax.tree.map(jnp.copy, state))
    p1 = state.particles
    p2 = st2.particles
    k1 = nblib.flat_cell_ids(p1.pos, p1.material != MATERIAL_NONE, params)
    k2 = nblib.flat_cell_ids(p2.pos, p2.material != MATERIAL_NONE, params)
    # NOTE: layouts differ after the step's resort; this only bounds the
    # per-step cell-crosser fraction via cell-id multiset drift
    import numpy as np
    h1 = np.bincount(np.asarray(k1), minlength=params.num_cells + 1)
    h2 = np.bincount(np.asarray(k2), minlength=params.num_cells + 1)
    moved = int(np.abs(h1 - h2).sum()) // 2
    print(f"cell-crossers/step >= {moved} "
          f"({moved / max(params.n_particles, 1) * 100:.1f}% of particles)")


if __name__ == "__main__":
    main()
