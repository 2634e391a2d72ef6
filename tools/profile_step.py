"""Component-level TPU timing for the DFSPH step (tunnel-hardened).

Times each stage of the step in isolation with chained inputs (the tunnel
serves identical-input dispatches from a result cache) and scalar-fetch sync
(block_until_ready is a no-op through the tunnel).

Usage: python tools/profile_step.py --n 400000 --reps 10
       python tools/profile_step.py --scene data/scenes/large_scale_dfsph.json
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, state, reps, sync, *, perturb=None):
    """fn: state -> state-like (chained); sync: state -> scalar fetch."""
    out = fn(state)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    cur = state
    for _ in range(reps):
        cur = fn(cur)
    sync(cur)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--scene", default=None,
                    help="profile a scene JSON instead of the synthetic cube")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.solvers import common, dfsph
    from sph_project_tpu.ops.pairs import slab_pack

    if args.scene:
        from sph_project_tpu.scene import load_scene
        scene, state = load_scene(args.scene)
    else:
        scene, state = bench.build_synthetic(args.n)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = jax.jit(simlib.get_step_fn(params))
    for _ in range(5):
        state, diag = step(state)
    float(state.t)
    print(f"# n={params.n_particles} n_pad={params.n_pad} "
          f"su={params.pair_dma_su} grid={params.grid_num}")

    def sync_state(s):
        float(jnp.sum(s.particles.pos[0]))

    # full step
    t_step = timeit(lambda s: step(s)[0], state, args.reps, sync_state)

    # sort only (chained: sort is idempotent-ish but positions unchanged ->
    # result cache; add a tiny jitter to the state each rep)
    @jax.jit
    def sort_once(s, eps):
        p = s.particles
        s = s.replace(particles=p.replace(pos=p.pos + eps))
        return simlib.sort_state(s, params)[0]

    eps = 1e-9
    t_sort = timeit(lambda s: sort_once(s, eps), state, args.reps, sync_state)

    # env build
    from sph_project_tpu.ops import neighbors as nblib

    @jax.jit
    def env_build(s, eps):
        p = s.particles
        pos = p.pos + eps
        active = p.material != 0
        cells = nblib.flat_cell_ids(pos, active, params)
        produces = simlib.produces_output(p, s.rigid, params)
        env = simlib.build_env(p.replace(pos=pos), cells, produces, params)
        return s.replace(cached_neighbors=env)

    t_env = timeit(lambda s: env_build(s, eps), state, args.reps, sync_state)

    # one fused density+alpha pass (includes slab_pack of static keys)
    @jax.jit
    def dens_pass(s, eps):
        p = s.particles.replace(pos=s.particles.pos + eps)
        env = s.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        dens, alpha = dfsph.density_and_alpha(p, env, sl, params)
        return s.replace(particles=s.particles.replace(density=dens),
                         dfsph_alpha=alpha)

    t_dens = timeit(lambda s: dens_pass(s, eps), state, args.reps, sync_state)

    # slab_pack of the static keys alone
    @jax.jit
    def slabs_only(s, eps):
        p = s.particles.replace(pos=s.particles.pos + eps)
        env = s.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        return s.replace(particles=s.particles.replace(
            density=s.particles.density + sl["rest_volume"][..., :1].sum() * 0))

    try:
        t_slabs = timeit(lambda s: slabs_only(s, eps), state, args.reps,
                         sync_state)
    except Exception:
        t_slabs = float("nan")

    # one corrector iteration (correction pass + star pass + slab packs)
    @jax.jit
    def corr_iter(s, eps):
        p = s.particles.replace(pos=s.particles.pos + eps)
        env = s.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        kappa = s.dfsph_alpha
        ks = slab_pack(env, {"k": kappa})["k"]
        dv, f, tq = dfsph._correction(p, s.rigid, kappa, ks, env, sl, params)
        vel = p.vel + dv
        vs = slab_pack(env, {"v": vel})["v"]
        star = dfsph.compute_density_star(p, vel, vs, env, sl, params)
        return s.replace(particles=s.particles.replace(
            vel=vel, density=star * params.density0))

    t_corr = timeit(lambda s: corr_iter(s, eps), state, args.reps, sync_state)

    # nonpressure fused pass
    @jax.jit
    def nonp(s, eps):
        p = s.particles.replace(pos=s.particles.pos + eps)
        env = s.cached_neighbors
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        a_v, rf, rt = common.nonpressure_fused(p, s.rigid, env, sl, params)
        return s.replace(particles=s.particles.replace(acc=a_v))

    t_nonp = timeit(lambda s: nonp(s, eps), state, args.reps, sync_state)

    # window-tightness metrics from the env meta
    env = state.cached_neighbors
    if hasattr(env, "meta_pack"):
        from sph_project_tpu.ops import pair_dma as pd
        meta = np.asarray(env.meta_pack)
        wtab = np.asarray(env.wtab)
        G = env.group
        SB = pd.B * G
        NSB = params.n_pad // SB
        u_tiles = meta[:NSB, pd.OFF_UTILES:pd.OFF_UTILES + pd.Q_CAP * 3]
        w = wtab[:NSB].reshape(NSB, G * 2, 3, pd.R_CAP, 2)
        st, en = w[..., 0], w[..., 1]
        # compute tiles: ceil window spans at WT granularity (approx: ignore
        # union-relative alignment, add one tile per nonempty window)
        span = np.maximum(en - st, 0)
        tiles = np.where(span > 0, (span + pd.WT - 1) // pd.WT + 0, 0)
        total_tiles = int(tiles.sum())
        scanned = total_tiles * pd.WT * pd.HB / params.n_particles
        print(f"compute tiles/pass ≈ {total_tiles} of (B={pd.B},WT) "
              f"(scanned cands/particle ≈ {scanned:.0f}); overflow="
              f"{int(np.asarray(env.overflow))}")
        print(f"union DMA/pass ≈ {int(u_tiles.sum()) * pd.DT * 4 * 8 / 1e6:.0f} MB")

    iters = (int(diag["solver_iters"]), int(diag["div_iters"]))
    print(f"step        {t_step*1e3:8.1f} ms   (dens_iters={iters[0]} "
          f"div_iters={iters[1]})")
    print(f"sort        {t_sort*1e3:8.1f} ms")
    print(f"env_build   {t_env*1e3:8.1f} ms")
    print(f"slabs(stat) {t_slabs*1e3:8.1f} ms")
    print(f"dens+alpha  {t_dens*1e3:8.1f} ms (incl slabs)")
    print(f"corr_iter   {t_corr*1e3:8.1f} ms (2 passes + packs, incl slabs)")
    print(f"nonpressure {t_nonp*1e3:8.1f} ms (incl slabs)")


if __name__ == "__main__":
    main()
