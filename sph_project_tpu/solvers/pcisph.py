"""PCISPH: predictive-corrective incompressible SPH.

Physics matches the reference PCISPHSolver (SPH/fluid_solvers/PCISPH.py):
- precomputed stiffness k_PCI from an ideal lattice   PCISPH.py:128-151
- prediction-correction loop                          PCISPH.py:110-125
- step ordering                                       PCISPH.py:165-190

The host `while` loop becomes a `lax.while_loop`; the density error for the
break test is the one measured at the *start* of each iteration, exactly like
the reference (density_error is set by compute_density_star before the
pressure update).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import SimState
from ..ops import kernels
from ..ops.neighbors import Neighbors
from . import common


def compute_pcisph_k(params: SimParams) -> float:
    """Stiffness from ideal-lattice kernel-gradient sums (PCISPH.py:128-151).
    Pure function of static params — evaluated once on the host with numpy."""
    h = params.support_radius
    diam = params.particle_diameter * 0.97
    max_i = int(h / diam) + 1
    sum_grad = np.zeros(3)
    sum_grad2 = 0.0
    k = 8.0 / math.pi if params.dim == 3 else 40.0 / 7.0 / math.pi
    k = 6.0 * k / h ** params.dim
    rng = range(-max_i, max_i + 1)
    for i in rng:
        for j in rng:
            for l in rng:
                x = -np.array([i * diam, j * diam, l * diam])
                r = np.linalg.norm(x)
                q = r / h
                if r < h and r > 1e-5:
                    if q <= 0.5:
                        c = k * q * (3.0 * q - 2.0)
                    else:
                        c = -k * (1.0 - q) ** 2
                    g = c * x / (r * h)
                    sum_grad += g
                    sum_grad2 += float(g @ g)
    denom = float(sum_grad @ sum_grad) + sum_grad2
    dtv = params.dt * params.v0
    return -0.5 / (dtv * dtv) / denom


def _density_star_predicted(p, pred_pos, nbrs: Neighbors, params: SimParams):
    """rho* from predicted fluid positions; rigid neighbors keep their actual
    positions (PCISPH.py:48-62). Neighbor candidacy still comes from the
    original-position grid, like the reference's for_all_neighbors."""
    fluid_j = p.material[nbrs.idx] == MATERIAL_FLUID
    pos_j = jnp.where(fluid_j[..., None], pred_pos[nbrs.idx], p.pos[nbrs.idx])
    R = pred_pos[:, None, :] - pos_j
    dist = jnp.linalg.norm(R, axis=-1)
    W = jnp.where(nbrs.mask,
                  kernels.W(dist, params.support_radius, params.dim, params.kernel_type), 0.0)
    ratio = jnp.sum(p.rest_volume[nbrs.idx] * W, axis=1)   # rho*/rho0, no self term
    fluid_i = p.material == MATERIAL_FLUID
    star = jnp.where(fluid_i, ratio * params.density0, 0.0)
    nf = jnp.maximum(jnp.sum(fluid_i), 1)
    err = jnp.sum(jnp.where(fluid_i, jnp.maximum(ratio - 1.0, 0.0), 0.0)) / nf
    return star, err


def _pressure_acceleration_nowrench(p, pressure, nbrs: Neighbors, params: SimParams):
    """Symmetric pressure acceleration WITHOUT rigid wrench accumulation —
    the refine loop's temp acceleration (PCISPH.py:74-107)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    mat_j = p.material[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    p_over_rho2_i = (pressure / (p.density * p.density))[:, None]
    den_j = p.density[nbrs.idx]
    term_f = p.mass[nbrs.idx] * (p_over_rho2_i + pressure[nbrs.idx] / (den_j * den_j))
    term_b = params.density0 * p.rest_volume[nbrs.idx] * p_over_rho2_i
    acc = jnp.sum(jnp.where(fluid_j[..., None], -term_f[..., None] * gradW, 0.0), axis=1) \
        + jnp.sum(jnp.where(rigid_j[..., None], -term_b[..., None] * gradW, 0.0), axis=1)
    return jnp.where((p.material == MATERIAL_FLUID)[:, None], acc, 0.0)


def refine(p, nbrs: Neighbors, params: SimParams, k_pci: float):
    """The prediction-correction loop (PCISPH.py:110-125). Returns
    (pressure, iterations, final density error)."""
    fluid = (p.material == MATERIAL_FLUID)[:, None]

    def cond(carry):
        _, _, _, itr, err = carry
        return (itr < 1) | ((err >= params.pcisph_eta) & (itr < params.pcisph_max_iter))

    def body(carry):
        pressure, pred_v, pred_x, itr, _ = carry
        star, err = _density_star_predicted(p, pred_x, nbrs, params)
        pressure = pressure + k_pci * (params.density0 - star)
        pressure = jnp.where(p.material == MATERIAL_FLUID,
                             jnp.maximum(pressure, 0.0), 0.0)
        p_acc = _pressure_acceleration_nowrench(p, pressure, nbrs, params)
        pred_v = jnp.where(fluid, p.vel + params.dt * (p.acc + p_acc), pred_v)
        pred_x = jnp.where(fluid, p.pos + params.dt * pred_v, pred_x)
        return pressure, pred_v, pred_x, itr + 1, err

    # init_step (PCISPH.py:153-162): zero pressure, predict from non-pressure acc
    pressure0 = jnp.zeros_like(p.pressure)
    pred_v0 = jnp.where(fluid, p.vel + params.dt * p.acc, p.vel)
    pred_x0 = jnp.where(fluid, p.pos + params.dt * pred_v0, p.pos)
    init = (pressure0, pred_v0, pred_x0, jnp.int32(0), jnp.float32(jnp.inf))
    pressure, _, _, itr, err = jax.lax.while_loop(cond, body, init)
    return pressure, itr, err


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One PCISPH step (PCISPH.py:165-185)."""
    k_pci = compute_pcisph_k(params)

    state, nbrs = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    p = p.replace(density=common.compute_density(p, nbrs, params))
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, nbrs, state, params)

    pressure, itr, err = refine(p, nbrs, params, k_pci)
    p = p.replace(pressure=pressure)

    p = common.update_fluid_velocity(p, params)
    acc, rf, rt = common.pressure_acceleration(p, rigid, nbrs, params)
    p = p.replace(acc=acc)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    p = common.update_fluid_velocity(p, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    state = plumbing.rigid_and_tail(state, nbrs, params)
    diag = plumbing.diagnostics(state, nbrs, params, extra=dict(
        solver_iters=itr, solver_err=err * params.density0))
    return state, diag
