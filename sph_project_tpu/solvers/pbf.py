"""PBF: position-based fluids.

Physics matches the reference PBFSolver (SPH/fluid_solvers/PBF.py): poly6 /
spiky kernels (params.kernel_type == "poly6" swaps them into every shared
operator, mirroring the reference's kernel_W/kernel_gradient overrides,
PBF.py:21-47), lambda from the density constraint (:68-101), s_corr
anti-clustering (:50-57), fixed 5 Jacobi position iterations (:61-65),
velocity from position delta (:133-143). Note the reference PBF container
allocates its lambda/old-position fields with size 0 so 3D PBF is effectively
broken upstream (pbf_container.py:13-14); here the fixed-capacity state makes
both 2D and 3D work.

The 5 position iterations move particles while the pair windows stay from the
step's sort — the reference behaves identically (candidates from the stale
grid, distances re-tested per iteration).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import SimState
from ..ops import kernels
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack
from . import common

LAMBDA_EPS = 100.0          # PBF.py:12
# s_corr constants live in params (pbf_corr_k / pbf_corr_delta_q; reference
# defaults PBF.py:13-14) so 3D scenes can tune them — see params.py note


def compute_density_moving(p, pos, pos_slab, env, sl, params):
    """Density at moved positions (refine calls compute_density per iteration,
    PBF.py:61-65), with the step's stale windows like the reference grid."""
    def kern(cx):
        _, d2, mask = cx.geometry(pos_blk="x", pos_slab="x")
        W = kernels.W(jnp.sqrt(d2), params.support_radius, params.dim,
                      params.kernel_type)
        return {"s": cx.sum(cx.slab("rest_volume") * W, mask)}

    s = pair_exec.run(kern, env,
                      {"rest_volume": sl["rest_volume"], "x": pos_slab},
                      {"pos": p.pos, "x": pos}, params)["s"]
    dens = (p.rest_volume * kernels.W0(params.support_radius, params.dim,
                                       params.kernel_type) + s) * params.density0
    return jnp.where(p.material == MATERIAL_FLUID, dens, p.density)


def compute_lambda(p, dens, pos, pos_slab, env, sl, params) -> jnp.ndarray:
    """lambda_i = -C_i / (sum |grad|^2 + |sum grad|^2 + eps) (PBF.py:68-101)."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry(pos_blk="x", pos_slab="x")
        gw = kernels.grad_W_coef(jnp.sqrt(d2), params.support_radius,
                                 params.dim, params.kernel_type)
        mat_j = cx.slab("material")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        w_f = cx.slab("mass") / params.density0
        w_b = cx.slab("rest_volume") * cx.blk("dens") / params.density0
        w = (cx.where(fluid_j, w_f, 0.0) + cx.where(rigid_j, w_b, 0.0)) * gw
        out = {"sum_sq": cx.sum(w * w * d2, fluid_j | rigid_j)}
        for d in range(dim):
            out[f"vec{d}"] = cx.sum(w * R[d], fluid_j | rigid_j)
        return out

    out = pair_exec.run(kern, env,
                        {"material": sl["material"], "mass": sl["mass"],
                         "rest_volume": sl["rest_volume"], "x": pos_slab},
                        {"pos": p.pos, "x": pos, "dens": dens}, params)
    denom = out["sum_sq"] + jnp.sum(out["vec"] * out["vec"], axis=-1) + LAMBDA_EPS
    constraint = dens / params.density0 - 1.0   # deliberately unclamped (PBF.py:77-78)
    lam = -constraint / denom
    return jnp.where(p.material == MATERIAL_FLUID, lam, 0.0)


def fix_position(p, lam, lam_slab, dens, pos, pos_slab, env, sl, params) -> jnp.ndarray:
    """dx_i = sum_j (lam_i + lam_j + s_corr) gradW * m_j / rho0 (PBF.py:104-131)."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry(pos_blk="x", pos_slab="x")
        dist = jnp.sqrt(d2)
        gw = kernels.grad_W_coef(dist, params.support_radius, params.dim,
                                 params.kernel_type)
        w_q = kernels.W(jnp.float32(params.pbf_corr_delta_q *
                                    params.support_radius),
                        params.support_radius, params.dim, params.kernel_type)
        ratio = kernels.W(dist, params.support_radius, params.dim,
                          params.kernel_type) / jnp.maximum(w_q, 1e-30)
        scorr = -params.pbf_corr_k * ratio ** 4
        mat_j = cx.slab("material")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        lam_i = cx.blk("lam")
        coef = (cx.where(fluid_j, (lam_i + cx.slab("lam") + scorr) *
                         cx.slab("mass"), 0.0) +
                cx.where(rigid_j, (2.0 * lam_i + scorr) *
                         cx.slab("rest_volume") * params.density0, 0.0)) * gw
        return {f"dx{d}": cx.sum(coef * R[d], mask) for d in range(dim)}

    out = pair_exec.run(kern, env,
                        {"material": sl["material"], "mass": sl["mass"],
                         "rest_volume": sl["rest_volume"], "x": pos_slab,
                         "lam": lam_slab},
                        {"pos": p.pos, "x": pos, "lam": lam}, params)
    dx = out["dx"] / params.density0
    return jnp.where((p.material == MATERIAL_FLUID)[:, None], dx, 0.0)


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One PBF step (PBF.py:145-158). No rigid solve / inserts — the
    reference's PBF path doesn't run them either."""
    state, env = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)

    p, rigid = plumbing.non_pressure_acceleration(p, rigid, env, sl, state, params)
    p = common.update_fluid_velocity(p, params)
    old_pos = p.pos
    p = common.update_fluid_position(p, rigid, params)
    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)

    for _ in range(params.pbf_iters):                      # fixed 5 (PBF.py:61-65)
        moved = slab_pack(env, {"x": p.pos})
        dens = compute_density_moving(p, p.pos, moved["x"], env, sl, params)
        lam = compute_lambda(p, dens, p.pos, moved["x"], env, sl, params)
        lam_slab = slab_pack(env, {"l": lam})["l"]
        dx = fix_position(p, lam, lam_slab, dens, p.pos, moved["x"], env, sl, params)
        p = p.replace(pos=p.pos + dx, density=dens)

    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)
    fluid = (p.material == MATERIAL_FLUID)[:, None]
    p = p.replace(vel=jnp.where(fluid, (p.pos - old_pos) / params.dt, p.vel))

    # base step wrapper tail (base_solver.py:692-696) still runs for PBF
    # (dynamic bodies only: apply_rigid_volume is a no-op for static walls)
    if params.has_dynamic_rigid:
        fresh = slab_pack(env, {"x": p.pos, "object_id": p.object_id})
        sl["object_id"] = fresh["object_id"]
        p = common.compute_rigid_particle_volume(p, env, sl, params,
                                                 pos_slab=fresh["x"])
    state = state.replace(
        particles=p, rigid=rigid,
        t=state.t + params.dt, step_count=state.step_count + 1,
    )
    diag = plumbing.diagnostics(state, env, params, extra=dict(
        solver_iters=jnp.int32(params.pbf_iters), solver_err=jnp.float32(0)))
    return state, diag
