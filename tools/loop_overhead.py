"""Measure lax.while_loop fixed overhead in the DFSPH corrector context.

The r4d step bisect showed the divergence solve (2 pair passes) costing as
much as the density solve (5 passes) — suspicious of a large fixed cost per
while_loop construct (the round-2 lesson: a mid-step lax.cond poisoned the
XLA schedule for ~100 ms). This tool A/Bs, at the real headline scene and
settled-regime state:

  corr x1           one _correction pass alone
  star x1           one density-star probe alone
  loop(K)           the corrector loop with its cond forced to exactly K
                    body iterations (while_loop semantics, fixed trip count)
  unroll(K)         the same K body iterations unrolled in the trace

loop(K) - unroll(K) is the while_loop's scheduling overhead in-context.

Usage: python tools/loop_overhead.py --scene data/scenes/large_scale_dfsph.json
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
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sph_project_tpu import sim as simlib
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
    print(f"# n_pad={params.n_pad} K={args.k}")

    K = args.k

    def body_once(p, rigid, vel, star, env, sl, alpha):
        kappa = (star - 1.0) * alpha / params.dt
        ks = slab_pack(env, {"k": kappa})
        dv, f, tq = dfsph._correction(p, rigid, kappa, ks["k"], env, sl,
                                      params)
        vel = vel + dv
        vs = slab_pack(env, {"v": vel})["v"]
        star = dfsph.compute_density_star(p, vel, vs, env, sl, params)
        err = dfsph._avg_over_active(
            star - jnp.where(p.material == 1, 1.0, 0.0), p, params)
        return vel, star, f, tq, err

    def setup(state):
        p, rigid = state.particles, state.rigid
        env = state.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        alpha = state.dfsph_alpha
        vs0 = slab_pack(env, {"v": p.vel})["v"]
        star0 = dfsph.compute_density_star(p, p.vel, vs0, env, sl, params)
        return p, rigid, env, sl, alpha, star0

    def mk_corr():
        def fn(state):
            p, rigid, env, sl, alpha, star0 = setup(state)
            kappa = (star0 - 1.0) * alpha / params.dt
            ks = slab_pack(env, {"k": kappa})
            dv, _, _ = dfsph._correction(p, rigid, kappa, ks["k"], env, sl,
                                         params)
            return state.replace(particles=p.replace(vel=p.vel + 1e-12 * dv))
        return jax.jit(fn, donate_argnums=0)

    def mk_star():
        def fn(state):
            p = state.particles
            env = state.cached_neighbors
            sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
            vs0 = slab_pack(env, {"v": p.vel})["v"]
            star0 = dfsph.compute_density_star(p, p.vel, vs0, env, sl, params)
            return state.replace(particles=p.replace(
                vel=p.vel + 1e-12 * star0[:, None]))
        return jax.jit(fn, donate_argnums=0)

    def mk_loop():
        def fn(state):
            p, rigid, env, sl, alpha, star0 = setup(state)

            def cond(c):
                return c[4] < K

            def body(c):
                vel, star, rf, rt, itr, _ = c
                vel, star, f, tq, err = body_once(p, rigid, vel, star, env,
                                                  sl, alpha)
                return vel, star, rf + f, rt + tq, itr + 1, err

            init = (p.vel, star0, jnp.zeros_like(rigid.force),
                    jnp.zeros_like(rigid.torque), jnp.int32(0),
                    jnp.float32(jnp.inf))
            vel, star, rf, rt, itr, err = jax.lax.while_loop(cond, body, init)
            return state.replace(particles=p.replace(
                vel=p.vel + 1e-12 * vel + 1e-12 * err))
        return jax.jit(fn, donate_argnums=0)

    def mk_unroll():
        def fn(state):
            p, rigid, env, sl, alpha, star0 = setup(state)
            vel, star = p.vel, star0
            err = jnp.float32(0.0)
            for _ in range(K):
                vel, star, f, tq, err = body_once(p, rigid, vel, star, env,
                                                  sl, alpha)
            return state.replace(particles=p.replace(
                vel=p.vel + 1e-12 * vel + 1e-12 * err))
        return jax.jit(fn, donate_argnums=0)

    variants = [("corr x1 (+star0)", mk_corr()),
                ("star x1", mk_star()),
                (f"loop({K}) (+star0)", mk_loop()),
                (f"unroll({K}) (+star0)", mk_unroll())]
    for label, fn in variants:
        cur = fn(jax.tree.map(jnp.copy, state))
        float(jnp.sum(cur.particles.vel[0]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            cur = fn(cur)
        float(jnp.sum(cur.particles.vel[0]))
        t = (time.perf_counter() - t0) / args.reps
        print(f"{label:22s} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
