"""Over-relaxation sweep for the DFSPH constant-density solver.

At TRUE hydrostatic settle the headline scene runs 10-19 density
iterations/step with loop-entry error only ~1.2-1.8x the exit tolerance
(warm_diag_headline_r5b.log): the Jacobi-style kappa update propagates
pressure one neighborhood hop per iteration, so deep columns crawl. This
probes whether SOR (params.dfsph_omega / the traced ``omega`` argument of
``correct_density_error``) cuts the crawl — per omega value, from the SAME
pre-solve state:

    cold iters | warm(0.5) iters | full(1.0) iters | exit err | rho_max'

``omega`` is a traced scalar, so the whole sweep shares ONE compiled probe.
A divergent omega shows up as iters == the probe's reduced cap (60) and a
rho_max' excursion; the exit tolerance is checked on the REAL density error
either way, so any converged row has reference-quality physics.

Usage (settle once with tools/warm_diag.py --save-state, then):
  python tools/omega_diag.py --scene data/scenes/large_scale_dfsph.json \
      --load-state /tmp/headline_settled --omegas 1.0,1.2,1.4,1.6
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="data/scenes/large_scale_dfsph.json")
    ap.add_argument("--settle", type=int, default=1250)
    ap.add_argument("--steps", type=int, default=4,
                    help="probe rows (the real step advances between rows)")
    ap.add_argument("--omegas", default="1.0,1.2,1.4,1.6")
    ap.add_argument("--load-state", default=None)
    ap.add_argument("--save-state", default=None)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    omegas = [float(x) for x in args.omegas.split(",")]

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sph_project_tpu import sim as simlib
    from sph_project_tpu.core.params import MATERIAL_FLUID
    from sph_project_tpu.scene import load_scene
    from sph_project_tpu.solvers import common, dfsph

    scene, state = load_scene(args.scene, dfsph_warm_start=True)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = simlib._jitted_step(params)
    P = simlib.Plumbing

    if args.load_state:
        from sph_project_tpu.io import checkpoint
        state, _ = step(state)
        state = checkpoint.restore(args.load_state, state)
        print(f"# restored settled state from {args.load_state}", flush=True)
    else:
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

    # probe params: reduced iteration cap so a divergent omega costs 60
    # iterations, not 1000
    pp = dataclasses.replace(params, dfsph_max_iter=60)

    def probe_fn(state, om):
        p, rigid = state.particles, state.rigid
        env0 = state.cached_neighbors
        sl0 = common.particle_slabs(env0, p, common.STATIC_SLAB_KEYS)
        alpha = state.dfsph_alpha
        fluid_i = p.material == MATERIAL_FLUID

        p2, rigid2 = P.non_pressure_acceleration(p, rigid, env0, sl0,
                                                 state, pp)
        p2 = common.update_fluid_velocity(p2, pp)
        kprev = state.dfsph_kappa

        out = {}
        pc, _, itr, err, _ = dfsph.correct_density_error(
            p2, rigid2, alpha, env0, sl0, pp, omega=om)
        out.update(cold_iters=itr, cold_err=err)

        def rho_after(pv):
            vs = dfsph.slab_pack(env0, {"v": pv.vel})["v"]
            star = dfsph.compute_density_star(p2, pv.vel, vs, env0, sl0, pp)
            return common.global_max(
                jnp.where(fluid_i, star, 0.0), pp) * pp.density0

        out["cold_rho_max"] = rho_after(pc)

        for tag, wf in (("warm", 0.5), ("full", 1.0)):
            kappa_w = jnp.where(fluid_i, jnp.maximum(wf * kprev, 0.0), 0.0)
            dv, f, tq = dfsph._correction(p2, rigid2, kappa_w, None, env0,
                                          sl0, pp)
            pw, _, itr, err, _ = dfsph.correct_density_error(
                p2, rigid2, alpha, env0, sl0, pp,
                warm_pre=(kappa_w, dv, f, tq), omega=om)
            out[f"{tag}_iters"] = itr
            out[f"{tag}_err"] = err
            out[f"{tag}_rho_max"] = rho_after(pw)
        return out

    probe = jax.jit(probe_fn)

    print("step omega | iters cold/warm/full | exit err c/w/f | "
          "rho_max' c/w/f", flush=True)
    for i in range(args.steps):
        for om in omegas:
            o = {k: float(v) for k, v in
                 probe(state, jnp.float32(om)).items()}
            print(f"{i:3d} {om:5.2f} | {int(o['cold_iters']):3d}/"
                  f"{int(o['warm_iters']):3d}/{int(o['full_iters']):3d} | "
                  f"{o['cold_err']:.2e}/{o['warm_err']:.2e}/"
                  f"{o['full_err']:.2e} | "
                  f"{o['cold_rho_max']:.0f}/{o['warm_rho_max']:.0f}/"
                  f"{o['full_rho_max']:.0f}", flush=True)
        state, _ = step(state)


if __name__ == "__main__":
    main()
