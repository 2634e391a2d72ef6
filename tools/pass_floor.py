"""Engine-overhead floor: time pair passes with trivial kernels.

Times the DMA pair engine running (a) a 1-output mask-only kernel, (b) a
5-output mask-only kernel, (c) the real density+alpha kernel — on the same
env. Separates fixed engine cost (DMA issue/wait, scalar window math, tile
loop) and per-output accumulator traffic from per-pair physics VPU math.

Usage: python tools/pass_floor.py --scene data/scenes/large_scale_dfsph.json
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
    from sph_project_tpu.ops import pair_exec
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
    print(f"# n_pad={params.n_pad} su={params.pair_dma_su}")

    def timeit(fn, reps=args.reps):
        s = fn(state, 0.0)
        float(jnp.sum(s.particles.pos[0]))
        t0 = time.perf_counter()
        eps = 1e-9
        for i in range(reps):
            s = fn(state, (i + 1) * eps)
        float(jnp.sum(s.particles.pos[0]))
        return (time.perf_counter() - t0) / reps

    def make(kern_builder, n_out):
        @jax.jit
        def run(s, eps):
            p = s.particles.replace(pos=s.particles.pos + eps)
            env = s.cached_neighbors
            out = pair_exec.run(kern_builder(), env, {}, {"pos": p.pos},
                                params)
            names = ["qa", "qb", "qc", "qd", "qe"]
            acc = sum(out[k] for k in names[:n_out])
            return s.replace(particles=s.particles.replace(
                density=s.particles.density + 0.0 * acc))
        return run

    def trivial1():
        def kern(cx):
            _, d2, mask = cx.geometry()
            one = jnp.ones_like(d2)
            return {"qa": cx.sum(cx.where(mask, one, 0.0), mask)}
        return kern

    def trivial5():
        def kern(cx):
            _, d2, mask = cx.geometry()
            one = jnp.ones_like(d2)
            w = cx.where(mask, one, 0.0)
            return {k: cx.sum(w * (i + 1.0), mask)
                    for i, k in enumerate(["qa", "qb", "qc", "qd", "qe"])}
        return kern

    def nogeom1():
        # no geometry(): just window reads + constant sum — isolates the
        # distance math cost from windows/DMA/tile-loop cost
        def kern(cx):
            w = cx.slab("pos0")
            return {"qa": cx.sum(w, w < 1e30)}
        return kern

    t_ng = timeit(make(nogeom1, 1))
    t_1 = timeit(make(trivial1, 1))
    t_5 = timeit(make(trivial5, 5))

    @jax.jit
    def dens(s, eps):
        p = s.particles.replace(pos=s.particles.pos + eps)
        env = s.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        d, a = dfsph.density_and_alpha(p, env, sl, params)
        return s.replace(particles=s.particles.replace(density=d))

    t_d = timeit(dens)
    print(f"pass (no geometry, 1 out)   {t_ng*1e3:7.1f} ms")
    print(f"pass (geometry, 1 out)      {t_1*1e3:7.1f} ms")
    print(f"pass (geometry, 5 out)      {t_5*1e3:7.1f} ms")
    print(f"pass (density+alpha, 5 out) {t_d*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
