"""DFSPH: divergence-free SPH (constant-density + divergence-free solvers).

Physics matches the reference DFSPHSolver (SPH/fluid_solvers/DFSPH.py):
- stiffness factor alpha                DFSPH.py:22-62
- density star / density derivative     DFSPH.py:65-127 (incl. the <20
  neighbor particle-deficiency guard and the max(*, 1.0)/max(*, 0.0) clamps)
- constant-density corrector            DFSPH.py:216-294 (tol 1e-4)
- divergence-free corrector             DFSPH.py:131-211 (tol 1e-3*rho0/dt)
- step ordering                         DFSPH.py:298-319

TPU-native difference: both correctors are ``lax.while_loop``s carrying
(velocity, rigid wrench, error, iter) entirely on device — the reference syncs
a scalar to the host every solver iteration (its dominant overhead).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_NONE, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState, SimState
from ..ops import kernels
from ..ops.neighbors import Neighbors
from . import common


def compute_alpha(p: ParticleState, nbrs: Neighbors, params: SimParams) -> jnp.ndarray:
    """alpha_i = 1 / (|sum_j V_j gradW|^2 + sum_{fluid j} |V_j gradW|^2),
    zero when the denominator is tiny (DFSPH.py:22-62). The squared-norm sum
    only counts fluid neighbors; the vector sum counts all."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    vj = p.rest_volume[nbrs.idx]
    grad_pj = jnp.where(nbrs.mask[..., None], -vj[..., None] * gradW, 0.0)
    fluid_j = nbrs.mask & (p.material[nbrs.idx] == MATERIAL_FLUID)
    sum_sq = jnp.sum(jnp.where(fluid_j, jnp.sum(grad_pj * grad_pj, axis=-1), 0.0), axis=1)
    vec = jnp.sum(grad_pj, axis=1)
    denom = sum_sq + jnp.sum(vec * vec, axis=-1)
    alpha = jnp.where(denom > 1e-5, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.where(p.material == MATERIAL_FLUID, alpha, 0.0)


def _divergence_sum(p: ParticleState, vel: jnp.ndarray, nbrs: Neighbors,
                    params: SimParams) -> jnp.ndarray:
    """sum_j V_j (v_i - v_j) . gradW_ij over all neighbors (DFSPH.py:90-101)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    dv = vel[:, None, :] - vel[nbrs.idx]
    contrib = p.rest_volume[nbrs.idx] * jnp.sum(dv * gradW, axis=-1)
    return jnp.sum(jnp.where(nbrs.mask, contrib, 0.0), axis=1)


def compute_density_derivative(p: ParticleState, vel: jnp.ndarray,
                               nbrs: Neighbors, params: SimParams) -> jnp.ndarray:
    """(D rho/Dt)/rho0, clamped positive; zeroed on particle deficiency
    (< 20 neighbors in 3D, < 7 in 2D; DFSPH.py:65-87)."""
    adv = jnp.maximum(_divergence_sum(p, vel, nbrs, params), 0.0)
    min_nbrs = 20 if params.dim == 3 else 7
    adv = jnp.where(nbrs.count < min_nbrs, 0.0, adv)
    return jnp.where(p.material == MATERIAL_FLUID, adv, 0.0)


def compute_density_star(p: ParticleState, vel: jnp.ndarray,
                         nbrs: Neighbors, params: SimParams) -> jnp.ndarray:
    """rho*/rho0 = rho/rho0 + dt * divergence-sum, clamped >= 1 (DFSPH.py:104-114)."""
    star = p.density / params.density0 + params.dt * _divergence_sum(p, vel, nbrs, params)
    star = jnp.maximum(star, 1.0)
    return jnp.where(p.material == MATERIAL_FLUID, star, 0.0)


def _correction(
    p: ParticleState, rigid: RigidState, kappa: jnp.ndarray,
    nbrs: Neighbors, params: SimParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Velocity correction dv and rigid wrench for one corrector iteration
    (DFSPH.py:161-202 / 245-283; both correctors share this form)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    grad_pj = p.rest_volume[nbrs.idx][..., None] * gradW        # (N, K, dim)
    mat_j = p.material[nbrs.idx]
    k_i = kappa[:, None]
    rho_i = p.density[:, None]
    eps = params.dfsph_eps * params.dt

    k_j = kappa[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID) & (jnp.abs(k_i + k_j) > eps)
    coef_f = (k_i / rho_i + k_j / p.density[nbrs.idx]) * params.density0
    dv_f = jnp.where(fluid_j[..., None], -grad_pj * coef_f[..., None], 0.0)

    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID) & (jnp.abs(k_i) > eps)
    coef_b = (k_i / rho_i) * params.density0
    dv_b = jnp.where(rigid_j[..., None], -grad_pj * coef_b[..., None], 0.0)

    fluid_i = p.material == MATERIAL_FLUID
    dv = jnp.where(fluid_i[:, None], jnp.sum(dv_f + dv_b, axis=1), 0.0)

    # Wrench on dynamic rigid bodies (DFSPH.py:193-202), accumulated on the
    # RIGID particle's row: f_r = sum_{fluid i} V_r (-gradW_row) (k_i/rho_i)
    # * rho0/dt * (V_i rho0); arm = x_r - com_r (DFSPH uses pos_j).
    rigid_i_row = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
    k_n = kappa[nbrs.idx]
    rho_n = jnp.maximum(p.density[nbrs.idx], 1e-12)
    pair_ok = nbrs.mask & (mat_j == MATERIAL_FLUID) & rigid_i_row[:, None] & \
        (jnp.abs(k_n) > eps)
    c = -p.rest_volume[:, None] * (k_n / rho_n) * params.density0 / params.dt * \
        (p.rest_volume[nbrs.idx] * params.density0)
    f_pairs = jnp.where(pair_ok[..., None], c[..., None] * gradW, 0.0)
    force_pp = jnp.sum(f_pairs, axis=1)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    arm = p.pos - rigid.com[obj]
    torque_pp = common.pair_cross(arm, force_pp, params.dim)
    force, torque = common.reduce_wrench(force_pp, torque_pp, p, params)
    return dv, force, torque


def _avg_over_active(x: jnp.ndarray, p: ParticleState) -> jnp.ndarray:
    """Reference averages errors over *all* active particles, not just fluid
    (DFSPH.py:205-211, 285-294 divide by particle_num)."""
    n = jnp.maximum(jnp.sum(p.material != MATERIAL_NONE), 1)
    return jnp.sum(x) / n


def correct_density_error(
    p: ParticleState, rigid: RigidState, alpha: jnp.ndarray,
    nbrs: Neighbors, params: SimParams,
) -> Tuple[ParticleState, RigidState, jnp.ndarray, jnp.ndarray]:
    """Constant-density solver (DFSPH.py:225-243). Returns updated particles,
    rigid (accumulated wrench), iterations, final error."""
    star0 = compute_density_star(p, p.vel, nbrs, params)

    def cond(carry):
        _, _, _, _, itr, err = carry
        return (itr < 1) | ((err > params.dfsph_max_error) &
                            (itr < params.dfsph_max_iter))

    def body(carry):
        vel, star, rf, rt, itr, _ = carry
        kappa = (star - 1.0) * alpha / params.dt
        dv, f, tq = _correction(p.replace(vel=vel), rigid, kappa, nbrs, params)
        vel = vel + dv
        star = compute_density_star(p, vel, nbrs, params)
        err = _avg_over_active(star - jnp.where(p.material == MATERIAL_FLUID, 1.0, 0.0), p)
        return vel, star, rf + f, rt + tq, itr + 1, err

    init = (p.vel, star0, jnp.zeros_like(rigid.force),
            jnp.zeros_like(rigid.torque), jnp.int32(0), jnp.float32(jnp.inf))
    vel, _, rf, rt, itr, err = jax.lax.while_loop(cond, body, init)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    return p.replace(vel=vel), rigid, itr, err


def correct_divergence_error(
    p: ParticleState, rigid: RigidState, alpha: jnp.ndarray,
    nbrs: Neighbors, params: SimParams,
) -> Tuple[ParticleState, RigidState, jnp.ndarray, jnp.ndarray]:
    """Divergence-free solver (DFSPH.py:139-159)."""
    eta = params.dfsph_max_error_v * params.density0 / params.dt
    deriv0 = compute_density_derivative(p, p.vel, nbrs, params)

    def cond(carry):
        _, _, _, _, itr, err = carry
        return (itr < 1) | ((err > eta) & (itr < params.dfsph_max_iter_v))

    def body(carry):
        vel, deriv, rf, rt, itr, _ = carry
        kappa_v = deriv * alpha
        dv, f, tq = _correction(p.replace(vel=vel), rigid, kappa_v, nbrs, params)
        vel = vel + dv
        deriv = compute_density_derivative(p, vel, nbrs, params)
        err = _avg_over_active(params.density0 * deriv, p)
        return vel, deriv, rf + f, rt + tq, itr + 1, err

    init = (p.vel, deriv0, jnp.zeros_like(rigid.force),
            jnp.zeros_like(rigid.torque), jnp.int32(0), jnp.float32(jnp.inf))
    vel, _, rf, rt, itr, err = jax.lax.while_loop(cond, body, init)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    return p.replace(vel=vel), rigid, itr, err


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One DFSPH step (DFSPH.py:298-319). Density/alpha for the *first* call
    come from the end-of-previous-step computation; prepare() seeds them via
    an initial neighbor pass (DFSPH.py:321-324 semantics are preserved
    because density/alpha live in the carried state)."""
    p, rigid = state.particles, state.rigid
    nbrs0 = state.cached_neighbors  # built at end of previous step / prepare

    p, rigid = plumbing.non_pressure_acceleration(p, rigid, nbrs0, state, params)
    p = common.update_fluid_velocity(p, params)
    p, rigid, itr_d, err_d = correct_density_error(
        p, rigid, state.dfsph_alpha, nbrs0, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    state = plumbing.rigid_mid(state, nbrs0, params)
    p, rigid = state.particles, state.rigid

    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)
    state = state.replace(particles=p)

    state, nbrs = plumbing.neighbor_prep(state, params)
    p = state.particles
    p = p.replace(density=common.compute_density(p, nbrs, params))
    alpha = compute_alpha(p, nbrs, params)
    p, rigid, itr_v, err_v = correct_divergence_error(
        p, state.rigid, alpha, nbrs, params)

    # base step wrapper tail: time += dt, rigid volumes (base_solver.py:692-696)
    p = common.compute_rigid_particle_volume(p, nbrs, params)
    state = state.replace(
        particles=p, rigid=rigid, dfsph_alpha=alpha, cached_neighbors=nbrs,
        t=state.t + params.dt, step_count=state.step_count + 1,
    )
    diag = plumbing.diagnostics(state, nbrs, params, extra=dict(
        solver_iters=itr_d, solver_err=err_d * params.density0,
        div_iters=itr_v, div_err=err_v,
    ))
    return state, diag
