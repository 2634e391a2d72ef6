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
from ..ops import kernels
from ..ops.neighbors import Neighbors
from . import common


def _grads(p, nbrs: Neighbors, params: SimParams):
    R, dist = common.pair_disp(p.pos, nbrs)
    return kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)


def compute_dii(p, density_star_prev, nbrs, params):
    """d_ii = -sum_j rho0 V_j gradW / rho_j^2 (fluid j) with the rigid branch
    dividing by the stale advected density of i (IISPH.py:17-44)."""
    gradW = _grads(p, nbrs, params)
    mat_j = p.material[nbrs.idx]
    rho0v = params.density0 * p.rest_volume[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    rho_j2 = jnp.square(p.density[nbrs.idx])
    star_i2 = jnp.square(density_star_prev)[:, None]
    c_f = jnp.where(fluid_j, -rho0v / jnp.maximum(rho_j2, 1e-12), 0.0)
    c_b = jnp.where(rigid_j, -rho0v / jnp.maximum(star_i2, 1e-12), 0.0)
    return jnp.sum((c_f + c_b)[..., None] * gradW, axis=1)


def compute_aii(p, dii, nbrs, params):
    """a_ii = dt^2 sum_j rho0 V_j (d_ii - d_ji) . gradW (IISPH.py:46-68)."""
    gradW = _grads(p, nbrs, params)
    rho0v_j = params.density0 * p.rest_volume[nbrs.idx]
    dji = (params.density0 * p.rest_volume / jnp.square(p.density))[:, None, None] * gradW
    term = jnp.sum((dii[:, None, :] - dji) * gradW, axis=-1)
    s = jnp.sum(jnp.where(nbrs.mask, rho0v_j * term, 0.0), axis=1)
    return s * params.dt * params.dt


def compute_density_star(p, nbrs, params):
    """Advected density rho + dt sum_j rho0 V_j (v_i - v_j).gradW (IISPH.py:70-90)."""
    gradW = _grads(p, nbrs, params)
    dv = p.vel[:, None, :] - p.vel[nbrs.idx]
    contrib = params.density0 * p.rest_volume[nbrs.idx] * jnp.sum(dv * gradW, axis=-1)
    s = jnp.sum(jnp.where(nbrs.mask, contrib, 0.0), axis=1)
    return jnp.where(p.material == MATERIAL_FLUID, p.density + params.dt * s, p.density)


def refine(p, dii, aii, density_star, nbrs, params):
    """Relaxed-Jacobi pressure iteration (IISPH.py:124-200)."""
    gradW = _grads(p, nbrs, params)
    mat_j = p.material[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    rho0v_j = params.density0 * p.rest_volume[nbrs.idx]
    fluid_i = p.material == MATERIAL_FLUID
    nf = jnp.maximum(jnp.sum(fluid_i), 1)
    dpi = (params.density0 * p.rest_volume / jnp.square(p.density))   # (N,)
    si = params.density0 - density_star

    def one_iter(pressure):
        # d_ij p_j (fluid neighbors only; IISPH.py:124-145)
        c = jnp.where(fluid_j, -rho0v_j * pressure[nbrs.idx] /
                      jnp.maximum(jnp.square(p.density[nbrs.idx]), 1e-12), 0.0)
        dij_pj = jnp.sum(c[..., None] * gradW, axis=1)

        # sum_i (IISPH.py:147-182)
        dji = dpi[:, None, None] * gradW
        d_ji_pi = dji * pressure[:, None, None]
        inner_f = dij_pj[:, None, :] - dii[nbrs.idx] * pressure[nbrs.idx][..., None] \
            - (dij_pj[nbrs.idx] - d_ji_pi)
        t_f = jnp.where(fluid_j, rho0v_j * jnp.sum(inner_f * gradW, axis=-1), 0.0)
        t_b = jnp.where(rigid_j, rho0v_j * jnp.sum(dij_pj[:, None, :] * gradW, axis=-1), 0.0)
        sum_i = jnp.sum(t_f + t_b, axis=1) * params.dt * params.dt

        # relaxed-Jacobi update (IISPH.py:97-122)
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
    state, nbrs = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    p = p.replace(density=common.compute_density(p, nbrs, params),
                  pressure=jnp.zeros_like(p.pressure))
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, nbrs, state, params)
    p = common.update_fluid_velocity(p, params)

    dii = compute_dii(p, state.iisph_density_star, nbrs, params)
    aii = compute_aii(p, dii, nbrs, params)
    density_star = compute_density_star(p, nbrs, params)
    pressure, itr, err = refine(p, dii, aii, density_star, nbrs, params)
    p = p.replace(pressure=pressure)

    acc, rf, rt = common.pressure_acceleration(p, rigid, nbrs, params)
    p = p.replace(acc=acc)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    p = common.update_fluid_velocity(p, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid,
                          iisph_density_star=density_star)
    state = plumbing.rigid_and_tail(state, nbrs, params)
    diag = plumbing.diagnostics(state, nbrs, params, extra=dict(
        solver_iters=itr, solver_err=err * params.density0))
    return state, diag
