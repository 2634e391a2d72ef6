"""Why does the nine-rigid density solve run ~8 iterations with warm start on?

Per step, from the same pre-solve state (after non-pressure accel +
velocity update), runs the constant-density solver four ways:

  cold            no warm correction (reference algorithm)
  warm            0.5 * max(kappa_prev, 0)   (the shipping default)
  warm-unclamped  0.5 * kappa_prev           (is the >=0 clamp discarding
                                              useful rigid-contact info?)
  warm-full       1.0 * max(kappa_prev, 0)   (is 0.5 too timid here?)

and reports each variant's loop-entry error (the warm-corrected err0 vs
the cold star0 error) and iteration count, plus kappa-carry quality:
the fraction of negative kappa_prev among fluid rows, the correlation
between this step's accumulated kappa and the carried one, and the err0
split into near-rigid vs far-fluid contributions (near = inside the
dynamic-rigid AABB grown by 2*dh) — if the warm start is fine in open
fluid and bad near bodies, the contact pass is what churns the carry.

The real step (shipping config) advances the state between probes.

Usage:
  python tools/warm_diag.py --scene data/scenes/coupling_nine_rigid.json \
      --settle 250 --steps 12
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="data/scenes/coupling_nine_rigid.json")
    ap.add_argument("--settle", type=int, default=250)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--backend", default=None,
                    help="force a jax platform (e.g. cpu for a smoke run)")
    ap.add_argument("--save-state", default=None,
                    help="checkpoint the settled state here (reusable by "
                         "--load-state and tools/omega_diag.py)")
    ap.add_argument("--load-state", default=None,
                    help="restore a settled state instead of settling")
    args = ap.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sph_project_tpu import sim as simlib
    from sph_project_tpu.core.params import MATERIAL_FLUID, MATERIAL_RIGID
    from sph_project_tpu.ops.pairs import slab_pack
    from sph_project_tpu.scene import load_scene
    from sph_project_tpu.solvers import common, dfsph

    scene, state = load_scene(args.scene, dfsph_warm_start=True)
    params = scene.params
    assert params.dfsph_warm_start
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = simlib._jitted_step(params)
    P = simlib.Plumbing

    def probe_fn(state):
        p, rigid = state.particles, state.rigid
        env0 = state.cached_neighbors
        sl0 = common.particle_slabs(env0, p, common.STATIC_SLAB_KEYS)
        alpha = state.dfsph_alpha
        fluid_i = p.material == MATERIAL_FLUID

        # pre-solve state (cold structure: separate non-pressure pass)
        p2, rigid2 = P.non_pressure_acceleration(p, rigid, env0, sl0,
                                                 state, params)
        p2 = common.update_fluid_velocity(p2, params)

        # near-rigid mask: dynamic-rigid AABB + 2*dh
        dyn = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
        big = jnp.float32(1e30)
        lo = jnp.min(jnp.where(dyn[:, None], p.pos, big), axis=0) \
            - 2 * params.support_radius
        hi = jnp.max(jnp.where(dyn[:, None], p.pos, -big), axis=0) \
            + 2 * params.support_radius
        near = fluid_i & jnp.all((p.pos >= lo) & (p.pos <= hi), axis=1)

        kprev = state.dfsph_kappa

        def entry_err(vel0):
            vs = slab_pack(env0, {"v": vel0})["v"]
            star0 = dfsph.compute_density_star(p2, vel0, vs, env0, sl0,
                                               params)
            e = star0 - jnp.where(fluid_i, 1.0, 0.0)
            n = jnp.maximum(jnp.sum(p.material != 0), 1)
            e_near = jnp.sum(jnp.where(near, jnp.abs(e), 0.0)) / \
                jnp.maximum(jnp.sum(near), 1)
            e_far = jnp.sum(jnp.where(fluid_i & ~near, jnp.abs(e), 0.0)) / \
                jnp.maximum(jnp.sum(fluid_i & ~near), 1)
            return jnp.sum(e) / n, e_near, e_far

        out = {}
        # cold
        e0, en, ef = entry_err(p2.vel)
        _, _, itr, err, kacc_cold = dfsph.correct_density_error(
            p2, rigid2, alpha, env0, sl0, params)
        out.update(cold_err0=e0, cold_near=en, cold_far=ef, cold_iters=itr)

        def warm(tag, kappa_w):
            dv, f, tq = dfsph._correction(p2, rigid2, kappa_w, None, env0,
                                          sl0, params)
            vel0 = p2.vel + dv
            e0, en, ef = entry_err(vel0)
            _, _, itr, err, kacc = dfsph.correct_density_error(
                p2, rigid2, alpha, env0, sl0, params,
                warm_pre=(kappa_w, dv, f, tq))
            out.update({f"{tag}_err0": e0, f"{tag}_near": en,
                        f"{tag}_far": ef, f"{tag}_iters": itr})
            return kacc

        kacc_w = warm("warm", jnp.where(
            fluid_i, jnp.maximum(0.5 * kprev, 0.0), 0.0))
        warm("unclamped", jnp.where(fluid_i, 0.5 * kprev, 0.0))
        warm("mid", jnp.where(fluid_i, jnp.maximum(0.75 * kprev, 0.0), 0.0))
        warm("full", jnp.where(fluid_i, jnp.maximum(kprev, 0.0), 0.0))

        # kappa carry quality
        kf = jnp.where(fluid_i, kprev, 0.0)
        ka = jnp.where(fluid_i, kacc_cold, 0.0)
        nf = jnp.maximum(jnp.sum(fluid_i), 1)
        mu_p, mu_a = jnp.sum(kf) / nf, jnp.sum(ka) / nf
        dp_, da_ = jnp.where(fluid_i, kf - mu_p, 0), \
            jnp.where(fluid_i, ka - mu_a, 0)
        corr = jnp.sum(dp_ * da_) / jnp.maximum(
            jnp.sqrt(jnp.sum(dp_ ** 2) * jnp.sum(da_ ** 2)), 1e-30)
        out.update(
            kneg_frac=jnp.sum(fluid_i & (kprev < 0)) / nf,
            kneg_near_frac=jnp.sum(near & (kprev < 0)) /
            jnp.maximum(jnp.sum(near), 1),
            kappa_corr=corr,
            kappa_prev_abs=jnp.sum(jnp.abs(kf)) / nf,
        )
        return out

    probe = jax.jit(probe_fn)

    if args.load_state:
        from sph_project_tpu.io import checkpoint
        state, _ = step(state)   # populate cached env -> template structure
        state = checkpoint.restore(args.load_state, state)
        print(f"# restored settled state from {args.load_state}", flush=True)
    else:
        print(f"# settling {args.settle} steps at "
              f"{args.scene} (dt={params.dt})", flush=True)
        t0 = time.perf_counter()
        for i in range(args.settle):
            state, diag = step(state)
            if (i + 1) % 50 == 0:
                print(f"# settle {i+1}/{args.settle}: "
                      f"iters={int(diag['solver_iters'])}/"
                      f"{int(diag['div_iters'])} "
                      f"rho_max={float(diag['density_max']):.0f} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)
    if args.save_state:
        from sph_project_tpu.io import checkpoint
        checkpoint.save(args.save_state, state)
        print(f"# settled state saved to {args.save_state}", flush=True)

    hdr = ("step | iters c/w/u/m/f | err0 cold/warm/unclmp/mid/full | "
           "near:far warm | kneg(all,near) corr |kprev|")
    print(hdr, flush=True)
    for i in range(args.steps):
        o = {k: float(v) for k, v in probe(state).items()}
        print(f"{i:4d} | {int(o['cold_iters'])}/{int(o['warm_iters'])}/"
              f"{int(o['unclamped_iters'])}/{int(o['mid_iters'])}/"
              f"{int(o['full_iters'])} | "
              f"{o['cold_err0']:.2e}/{o['warm_err0']:.2e}/"
              f"{o['unclamped_err0']:.2e}/{o['mid_err0']:.2e}/"
              f"{o['full_err0']:.2e} | "
              f"{o['warm_near']:.2e}:{o['warm_far']:.2e} | "
              f"{o['kneg_frac']:.3f},{o['kneg_near_frac']:.3f} "
              f"{o['kappa_corr']:.3f} {o['kappa_prev_abs']:.3e}",
              flush=True)
        state, _ = step(state)


if __name__ == "__main__":
    main()
