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
from ..ops.pairs import PairEnv, run_blocked, slab_pack
from . import common


def compute_dii(p, density_star_prev, env, sl, params):
    """d_ii = -sum_j rho0 V_j gradW / rho_j^2 (fluid j) with the rigid branch
    dividing by the stale advected density of i (IISPH.py:17-44)."""
    def kern(ctx, sl_c, f_c):
        R, d2, mask = ctx.geometry(params)
        gradW = common._gradwfn(R, d2, params)
        mat_j = sl_c["material"][:, None, :]
        rho0v = params.density0 * sl_c["rest_volume"][:, None, :]
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        rho_j2 = jnp.square(sl_c["density"])[:, None, :]
        star_i2 = jnp.square(f_c["star_prev"])[:, :, None]
        c = jnp.where(fluid_j, -rho0v / jnp.maximum(rho_j2, 1e-12), 0.0) + \
            jnp.where(rigid_j, -rho0v / jnp.maximum(star_i2, 1e-12), 0.0)
        return ctx.sum_w(c[..., None] * gradW, mask)

    return run_blocked(kern, env,
                       {"material": sl["material"], "density": sl["density"],
                        "rest_volume": sl["rest_volume"]},
                       {"pos": p.pos, "star_prev": density_star_prev}, params)


def compute_aii(p, dii, dii_slab, env, sl, params):
    """a_ii = dt^2 sum_j rho0 V_j (d_ii - d_ji) . gradW (IISPH.py:46-68)."""
    dpi = params.density0 * p.rest_volume / jnp.maximum(jnp.square(p.density), 1e-12)

    def kern(ctx, sl_c, f_c):
        R, d2, mask = ctx.geometry(params)
        gradW = common._gradwfn(R, d2, params)
        rho0v_j = params.density0 * sl_c["rest_volume"][:, None, :]
        dji = f_c["dpi"][:, :, None, None] * gradW
        term = jnp.sum((f_c["dii"][:, :, None, :] - dji) * gradW, axis=-1)
        return ctx.sum_w(rho0v_j * term, mask)

    s = run_blocked(kern, env, {"rest_volume": sl["rest_volume"]},
                    {"pos": p.pos, "dii": dii, "dpi": dpi}, params)
    return s * params.dt * params.dt


def compute_density_star(p, env, sl, params):
    """Advected density rho + dt sum_j rho0 V_j (v_i - v_j).gradW (IISPH.py:70-90)."""
    def kern(ctx, sl_c, f_c):
        R, d2, mask = ctx.geometry(params)
        gradW = common._gradwfn(R, d2, params)
        dv = f_c["vel"][:, :, None, :] - sl_c["vel"][:, None, :, :]
        contrib = params.density0 * sl_c["rest_volume"][:, None, :] * \
            jnp.sum(dv * gradW, axis=-1)
        return ctx.sum_w(contrib, mask)

    s = run_blocked(kern, env,
                    {"rest_volume": sl["rest_volume"], "vel": sl["vel"]},
                    {"pos": p.pos, "vel": p.vel}, params)
    return jnp.where(p.material == MATERIAL_FLUID,
                     p.density + params.dt * s, p.density)


def refine(p, dii, aii, density_star, env, sl, params):
    """Relaxed-Jacobi pressure iteration (IISPH.py:124-200)."""
    fluid_i = p.material == MATERIAL_FLUID
    nf = jnp.maximum(jnp.sum(fluid_i), 1)
    dpi = params.density0 * p.rest_volume / jnp.maximum(jnp.square(p.density), 1e-12)
    si = params.density0 - density_star
    dii_slab = slab_pack(env, {"dii": dii})["dii"]

    def dij_pj_op(pr_slab):
        def kern(ctx, sl_c, f_c):
            R, d2, mask = ctx.geometry(params)
            gradW = common._gradwfn(R, d2, params)
            fluid_j = mask & (sl_c["material"] == MATERIAL_FLUID)[:, None, :]
            rho_j2 = jnp.maximum(jnp.square(sl_c["density"]), 1e-12)[:, None, :]
            rho0v = params.density0 * sl_c["rest_volume"][:, None, :]
            c = jnp.where(fluid_j, -rho0v * sl_c["pr"][:, None, :] / rho_j2, 0.0)
            return ctx.sum_w(c[..., None] * gradW, mask)
        return run_blocked(kern, env,
                           {"material": sl["material"], "density": sl["density"],
                            "rest_volume": sl["rest_volume"], "pr": pr_slab},
                           {"pos": p.pos}, params)

    def sum_i_op(pressure, pr_slab, dij_pj, dp_slab):
        def kern(ctx, sl_c, f_c):
            R, d2, mask = ctx.geometry(params)
            gradW = common._gradwfn(R, d2, params)
            mat_j = sl_c["material"][:, None, :]
            fluid_j = mask & (mat_j == MATERIAL_FLUID)
            rigid_j = mask & (mat_j == MATERIAL_RIGID)
            rho0v_j = params.density0 * sl_c["rest_volume"][:, None, :]
            dji = f_c["dpi"][:, :, None, None] * gradW
            d_ji_pi = dji * f_c["pr"][:, :, None, None]
            inner_f = f_c["dij_pj"][:, :, None, :] \
                - sl_c["dii"][:, None, :, :] * sl_c["pr"][:, None, :, None] \
                - (sl_c["dp"][:, None, :, :] - d_ji_pi)
            t_f = jnp.where(fluid_j, rho0v_j * jnp.sum(inner_f * gradW, axis=-1), 0.0)
            t_b = jnp.where(rigid_j, rho0v_j * jnp.sum(
                f_c["dij_pj"][:, :, None, :] * gradW, axis=-1), 0.0)
            return ctx.sum_w(t_f + t_b, mask)
        s = run_blocked(kern, env,
                        {"material": sl["material"],
                         "rest_volume": sl["rest_volume"],
                         "dii": dii_slab, "pr": pr_slab, "dp": dp_slab},
                        {"pos": p.pos, "dpi": dpi, "pr": pressure,
                         "dij_pj": dij_pj}, params)
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
        err = jnp.sum(resid) / nf / params.density0
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

    acc, rf, rt = common.pressure_acceleration(p, rigid, env, sl, params)
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
