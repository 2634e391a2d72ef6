"""IISPH: implicit incompressible SPH (relaxed Jacobi on pressure).

Physics matches the reference IISPHSolver (SPH/fluid_solvers/IISPH.py),
including the quirks the README flags as "not so correct" (README.md:11,215):
- d_ii uses the *previous step's* advected density for rigid neighbors
  (densities_star is computed after d_ii within the step, IISPH.py:39-44 vs
  :203-213) — we carry it across steps to reproduce that
- omega = 0.2, max 20 iterations, eta = 0.001 (IISPH.py:12-14)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import SimState
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack
from . import common


def compute_dii(p, density_star_prev, env, sl, params):
    """d_ii = -sum_j rho0 V_j gradW / rho_j^2 (fluid j) with the rigid branch
    dividing by the stale advected density of i (IISPH.py:17-44)."""
    dim = params.dim
    inv_star2 = 1.0 / jnp.maximum(jnp.square(density_star_prev), 1e-12)
    inv_rho_j2 = None  # per-pair from slabbed density

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        mat_j = cx.slab("material")
        rho0v = params.density0 * cx.slab("rest_volume")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        rho_j2 = jnp.maximum(jnp.square(cx.slab("density")), 1e-12)
        c = (cx.where(fluid_j, -rho0v / rho_j2, 0.0) +
             cx.where(rigid_j, -rho0v * cx.blk("inv_star2"), 0.0)) * gw
        return {f"dii{d}": cx.sum(c * R[d], mask) for d in range(dim)}

    return pair_exec.run(kern, env,
                         {"material": sl["material"], "density": sl["density"],
                          "rest_volume": sl["rest_volume"]},
                         {"pos": p.pos, "inv_star2": inv_star2}, params)["dii"]


def compute_aii(p, dii, dii_slab, env, sl, params):
    """a_ii = dt^2 sum_j rho0 V_j (d_ii - d_ji) . gradW (IISPH.py:46-68)."""
    dim = params.dim
    dpi = params.density0 * p.rest_volume / jnp.maximum(jnp.square(p.density), 1e-12)

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        rho0v_j = params.density0 * cx.slab("rest_volume")
        db = cx.vec_blk("dii")
        # (d_ii - d_ji) . gradW with d_ji = dpi * gw * R
        term = sum((db[d] - cx.blk("dpi") * gw * R[d]) * gw * R[d]
                   for d in range(dim))
        return {"s": cx.sum(rho0v_j * term, mask)}

    s = pair_exec.run(kern, env, {"rest_volume": sl["rest_volume"]},
                      {"pos": p.pos, "dii": dii, "dpi": dpi}, params)["s"]
    return s * params.dt * params.dt


def compute_density_star(p, env, sl, params):
    """Advected density rho + dt sum_j rho0 V_j (v_i - v_j).gradW (IISPH.py:70-90)."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
        dv_R = sum((vb[d] - vs[d]) * R[d] for d in range(dim))
        contrib = params.density0 * cx.slab("rest_volume") * dv_R * gw
        return {"s": cx.sum(contrib, mask)}

    s = pair_exec.run(kern, env,
                      {"rest_volume": sl["rest_volume"], "vel": sl["vel"]},
                      {"pos": p.pos, "vel": p.vel}, params)["s"]
    return jnp.where(p.material == MATERIAL_FLUID,
                     p.density + params.dt * s, p.density)


def refine(p, dii, aii, density_star, env, sl, params):
    """Relaxed-Jacobi pressure iteration (IISPH.py:124-200)."""
    dim = params.dim
    fluid_i = p.material == MATERIAL_FLUID
    nf = jnp.maximum(common.global_sum(fluid_i, params), 1)
    dpi = params.density0 * p.rest_volume / jnp.maximum(jnp.square(p.density), 1e-12)
    si = params.density0 - density_star
    dii_slab = slab_pack(env, {"dii": dii})["dii"]

    def dij_pj_op(pr_slab):
        def kern(cx):
            R, d2, mask = cx.geometry()
            gw = common._gw_coef(d2, params)
            fluid_j = mask & (cx.slab("material") == MATERIAL_FLUID)
            rho_j2 = jnp.maximum(jnp.square(cx.slab("density")), 1e-12)
            rho0v = params.density0 * cx.slab("rest_volume")
            c = cx.where(fluid_j, -rho0v * cx.slab("pr") / rho_j2, 0.0) * gw
            return {f"dp{d}": cx.sum(c * R[d], mask) for d in range(dim)}
        return pair_exec.run(kern, env,
                             {"material": sl["material"],
                              "density": sl["density"],
                              "rest_volume": sl["rest_volume"], "pr": pr_slab},
                             {"pos": p.pos}, params)["dp"]

    def sum_i_op(pressure, pr_slab, dij_pj, dp_slab):
        def kern(cx):
            R, d2, mask = cx.geometry()
            gw = common._gw_coef(d2, params)
            mat_j = cx.slab("material")
            fluid_j = mask & (mat_j == MATERIAL_FLUID)
            rigid_j = mask & (mat_j == MATERIAL_RIGID)
            rho0v_j = params.density0 * cx.slab("rest_volume")
            dijb = cx.vec_blk("dij_pj")
            diis = cx.vec_slab("dii")
            dps = cx.vec_slab("dp")
            prs = cx.slab("pr")
            # fluid: (dij_pj_i - dii_j p_j - (dij_pj_j - d_ji p_i)) . gradW
            t_f = 0.0
            for d in range(dim):
                d_ji_pi = cx.blk("dpi") * gw * R[d] * cx.blk("pr")
                inner = dijb[d] - diis[d] * prs - (dps[d] - d_ji_pi)
                t_f = t_f + inner * gw * R[d]
            t_b = sum(dijb[d] * gw * R[d] for d in range(dim))
            contrib = cx.where(fluid_j, rho0v_j * t_f, 0.0) + \
                cx.where(rigid_j, rho0v_j * t_b, 0.0)
            return {"s": cx.sum(contrib, mask)}
        s = pair_exec.run(kern, env,
                          {"material": sl["material"],
                           "rest_volume": sl["rest_volume"],
                           "dii": dii_slab, "pr": pr_slab, "dp": dp_slab},
                          {"pos": p.pos, "dpi": dpi, "pr": pressure,
                           "dij_pj": dij_pj}, params)["s"]
        return s * params.dt * params.dt

    def one_iter(pressure):
        pr_slab = slab_pack(env, {"pr": pressure})["pr"]
        dij_pj = dij_pj_op(pr_slab)
        dp_slab = slab_pack(env, {"dp": dij_pj})["dp"]
        sum_i = sum_i_op(pressure, pr_slab, dij_pj, dp_slab)
        can = jnp.abs(aii) > 1e-10
        new_p = (1.0 - params.iisph_omega) * pressure + \
            params.iisph_omega / jnp.where(can, aii, 1.0) * (si - sum_i)
        new_p = jnp.where(can, jnp.maximum(new_p, 0.0), 0.0)
        new_p = jnp.where(fluid_i, new_p, 0.0)
        resid = jnp.where(fluid_i & (new_p > 1e-10), aii * new_p + sum_i - si, 0.0)
        err = common.global_sum(resid, params) / nf / params.density0
        return new_p, err

    def cond(carry):
        _, itr, err = carry
        return (itr < 1) | ((err >= params.iisph_eta) & (itr < params.iisph_max_iter))

    def body(carry):
        pressure, itr, _ = carry
        pressure, err = one_iter(pressure)
        return pressure, itr + 1, err

    pressure, itr, err = jax.lax.while_loop(
        cond, body, (jnp.zeros_like(p.pressure), jnp.int32(0), jnp.float32(jnp.inf)))
    return pressure, itr, err


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One IISPH step (IISPH.py:203-228)."""
    state, env = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    p = p.replace(density=common.compute_density(p, env, sl, params),
                  pressure=jnp.zeros_like(p.pressure))
    sl["density"] = slab_pack(env, {"d": p.density})["d"]
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, env, sl, state, params)
    p = common.update_fluid_velocity(p, params)
    sl["vel"] = slab_pack(env, {"v": p.vel})["v"]

    dii = compute_dii(p, state.iisph_density_star, env, sl, params)
    aii = compute_aii(p, dii, None, env, sl, params)
    density_star = compute_density_star(p, env, sl, params)
    pressure, itr, err = refine(p, dii, aii, density_star, env, sl, params)
    p = p.replace(pressure=pressure)
    sl["pressure"] = slab_pack(env, {"pr": pressure})["pr"]

    acc, rf, rt = common.pressure_acceleration(
        p, rigid, env, sl, params, with_wrench=params.has_dynamic_rigid)
    p = p.replace(acc=acc)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    p = common.update_fluid_velocity(p, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid,
                          iisph_density_star=density_star)
    state = plumbing.rigid_and_tail(state, env, sl, params)
    diag = plumbing.diagnostics(state, env, params, extra=dict(
        solver_iters=itr, solver_err=err * params.density0))
    return state, diag
