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
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import SimState
from ..ops import kernels
from ..ops.neighbors import Neighbors
from . import common

LAMBDA_EPS = 100.0          # PBF.py:12
CORR_K = 0.001              # PBF.py:13
CORR_DELTA_Q = 0.3          # PBF.py:14


def compute_lambda(p, nbrs: Neighbors, params: SimParams) -> jnp.ndarray:
    """lambda_i = -C_i / (sum |grad|^2 + |sum grad|^2 + eps) (PBF.py:68-101)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    mat_j = p.material[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    w_f = p.mass[nbrs.idx] / params.density0
    w_b = p.rest_volume[nbrs.idx] * p.density[:, None] / params.density0
    w = jnp.where(fluid_j, w_f, jnp.where(rigid_j, w_b, 0.0))
    g = w[..., None] * gradW
    sum_sq = jnp.sum(jnp.where(fluid_j | rigid_j, jnp.sum(g * g, axis=-1), 0.0), axis=1)
    vec = jnp.sum(jnp.where((fluid_j | rigid_j)[..., None], g, 0.0), axis=1)
    denom = sum_sq + jnp.sum(vec * vec, axis=-1) + LAMBDA_EPS
    constraint = p.density / params.density0 - 1.0       # deliberately unclamped (PBF.py:77-78)
    lam = -constraint / denom
    return jnp.where(p.material == MATERIAL_FLUID, lam, 0.0)


def fix_position(p, lam, nbrs: Neighbors, params: SimParams) -> jnp.ndarray:
    """dx_i = sum_j (lam_i + lam_j + s_corr) gradW * m_j / rho0 (PBF.py:104-131)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    w_q = kernels.W(jnp.asarray(CORR_DELTA_Q * params.support_radius, jnp.float32),
                    params.support_radius, params.dim, params.kernel_type)
    ratio = kernels.W(dist, params.support_radius, params.dim, params.kernel_type) / \
        jnp.maximum(w_q, 1e-30)
    scorr = -CORR_K * ratio ** 4
    mat_j = p.material[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    lam_i = lam[:, None]
    coef_f = jnp.where(fluid_j, (lam_i + lam[nbrs.idx] + scorr) * p.mass[nbrs.idx], 0.0)
    coef_b = jnp.where(rigid_j, (2.0 * lam_i + scorr) *
                       p.rest_volume[nbrs.idx] * params.density0, 0.0)
    dx = jnp.sum((coef_f + coef_b)[..., None] * gradW, axis=1) / params.density0
    return jnp.where((p.material == MATERIAL_FLUID)[:, None], dx, 0.0)


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One PBF step (PBF.py:145-158). No rigid solve / inserts — the
    reference's PBF path doesn't run them either."""
    state, nbrs = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid

    p, rigid = plumbing.non_pressure_acceleration(p, rigid, nbrs, state, params)
    p = common.update_fluid_velocity(p, params)
    old_pos = p.pos
    p = common.update_fluid_position(p, rigid, params)
    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)

    for _ in range(params.pbf_iters):                      # fixed 5 (PBF.py:61-65)
        p = p.replace(density=common.compute_density(p, nbrs, params))
        lam = compute_lambda(p, nbrs, params)
        p = p.replace(pos=p.pos + fix_position(p, lam, nbrs, params))

    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)
    fluid = (p.material == MATERIAL_FLUID)[:, None]
    p = p.replace(vel=jnp.where(fluid, (p.pos - old_pos) / params.dt, p.vel))

    # base step wrapper tail (base_solver.py:692-696) still runs for PBF
    p = common.compute_rigid_particle_volume(p, nbrs, params)
    state = state.replace(
        particles=p, rigid=rigid,
        t=state.t + params.dt, step_count=state.step_count + 1,
    )
    diag = plumbing.diagnostics(state, nbrs, params, extra=dict(
        solver_iters=jnp.int32(params.pbf_iters), solver_err=jnp.float32(0)))
    return state, diag
