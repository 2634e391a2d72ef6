"""In-context DFSPH stage costs: time truncated step programs.

Builds jitted programs that run the step through stage 1..k and returns
the full state (so XLA cannot DCE a stage); successive deltas give each
stage's cost inside the real compilation context — component-in-isolation
timings (profile_step.py) miss scheduling/fusion interactions.

Usage: python tools/step_bisect.py --scene data/scenes/large_scale_dfsph.json
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
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.core.params import MATERIAL_FLUID
    from sph_project_tpu.ops.pairs import slab_pack
    from sph_project_tpu.solvers import common, dfsph

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
    P = simlib.Plumbing

    def upto(k):
        def fn(state):
            p, rigid = state.particles, state.rigid
            env0 = state.cached_neighbors
            sl0 = common.particle_slabs(env0, p, common.STATIC_SLAB_KEYS)
            p, rigid = P.non_pressure_acceleration(p, rigid, env0, sl0,
                                                   state, params)
            p = common.update_fluid_velocity(p, params)
            if k >= 2:
                p, rigid, itr_d, err_d, _ = dfsph.correct_density_error(
                    p, rigid, state.dfsph_alpha, env0, sl0, params)
            p = common.update_fluid_position(p, rigid, params)
            state = state.replace(particles=p, rigid=rigid)
            state = P.rigid_mid(state, env0, params)
            p = common.enforce_domain_boundary(state.particles, params,
                                               MATERIAL_FLUID)
            state = state.replace(particles=p)
            if k < 3:
                return state.replace(t=state.t + params.dt)
            state, env = P.neighbor_prep(state, params)
            p = state.particles
            sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
            if k >= 4:
                dens, alpha = dfsph.density_and_alpha(p, env, sl, params)
                p = p.replace(density=dens)
                sl["density"] = slab_pack(env, {"d": p.density})["d"]
            if k >= 5:
                p, rigid, itr_v, err_v, _ = dfsph.correct_divergence_error(
                    p, state.rigid, alpha, env, sl, params)
                state = state.replace(rigid=rigid)
            if k >= 6:
                if params.has_rigid:
                    p = common.compute_rigid_particle_volume(p, env, sl,
                                                             params)
                state = state.replace(
                    particles=p, dfsph_alpha=alpha, cached_neighbors=env)
                diag = P.diagnostics(state, env, params, extra=dict(
                    solver_iters=itr_d, div_iters=itr_v))
                state = state.replace(
                    t=state.t + params.dt + 0.0 * diag["density_avg"])
                return state
            state = state.replace(particles=p, cached_neighbors=env)
            return state.replace(t=state.t + params.dt)
        return jax.jit(fn, donate_argnums=0)

    labels = {1: "nonpressure+vel", 2: "+density solve", 3: "+sort/env",
              4: "+dens_alpha", 5: "+div solve", 6: "+tail/diag"}
    prev = 0.0
    for k in range(1, 7):
        fn = upto(k)
        # fresh device copy per variant: each fn donates its input
        cur = fn(jax.tree.map(jnp.copy, state))
        float(jnp.sum(cur.particles.pos[0]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            cur = fn(cur)
        float(jnp.sum(cur.particles.pos[0]))
        t = (time.perf_counter() - t0) / args.reps
        print(f"upto {k} ({labels[k]:16s}) {t*1e3:8.1f} ms  "
              f"delta {(t - prev)*1e3:7.1f} ms")
        prev = t


if __name__ == "__main__":
    main()
