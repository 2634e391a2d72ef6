"""Implicit viscosity: matrix-free block-Jacobi-preconditioned CG.

Physics matches the reference's implicit solver (base_solver.py:280-518),
itself after Weiler et al. 2018 "A Physically Consistent Implicit Viscosity
Solver for SPH Fluids":

- system matrix rows A_ij = c_ij * (gradW ⊗ R) with the fluid/rigid
  coefficient split (base_solver.py:348-371)
- block-diagonal preconditioner D_i^-1 (base_solver.py:301-308)
- rigid contribution folded into b (base_solver.py:334-346)
- warm start x0 = v(t) + (x_prev - v(t-dt)) carried in SimState.visc_x
  (base_solver.py:290-293, 439-443, 517)
- after the solve, the *standard* viscosity operator evaluated at the CG
  solution becomes the acceleration (and rigid wrench) — the reference's
  trick at base_solver.py:509-517

TPU-native difference: the CG driver is a ``lax.while_loop`` with on-device
dot products (the reference reads the residual back to the host every
iteration). The A_ij structure (scalar c_ij times gradW⊗R) is exploited so
each matvec is a gather + two (N, K) contractions — no (N, K, 3, 3)
materialization.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState, SimState
from ..ops import kernels
from ..ops.neighbors import Neighbors
from . import common


def _pair_coeffs(p: ParticleState, nbrs: Neighbors, params: SimParams):
    """c_ij such that A_ij = c_ij * (gradW ⊗ R) (base_solver.py:348-371)."""
    R, dist = common.pair_disp(p.pos, nbrs)
    gradW = kernels.grad_W(R, params.support_radius, params.dim, dist, params.kernel_type)
    denom = dist * dist + 0.01 * params.support_radius ** 2
    d2 = 2.0 * (params.dim + 2)
    mat_j = p.material[nbrs.idx]
    fluid_j = nbrs.mask & (mat_j == MATERIAL_FLUID)
    rigid_j = nbrs.mask & (mat_j == MATERIAL_RIGID)
    m_ij = 0.5 * (p.mass[:, None] + p.mass[nbrs.idx])
    c_f = -d2 * params.viscosity * m_ij / p.density[nbrs.idx] / denom
    m_b = params.density0 * p.rest_volume[nbrs.idx]
    c_b = -d2 * params.viscosity_b * m_b / p.density[:, None] / denom
    c = jnp.where(fluid_j, c_f, jnp.where(rigid_j, c_b, 0.0))
    return R, gradW, c, fluid_j, rigid_j


def implicit_viscosity_solve(
    p: ParticleState, rigid: RigidState, state: SimState,
    nbrs: Neighbors, params: SimParams,
) -> Tuple[ParticleState, RigidState, SimState]:
    """Solve (I - dt/rho0 A) v_new = b, then fold the result into the
    acceleration. Returns (particles with updated acc, rigid with wrench,
    state with next warm start)."""
    fluid_i = p.material == MATERIAL_FLUID
    fmask = fluid_i[:, None]
    dt_rho = params.dt / params.density0

    R, gradW, c, fluid_j, rigid_j = _pair_coeffs(p, nbrs, params)

    # --- preconditioner D_i = I - dt/rho0 * sum_j (-A_ij) ------------------
    # sum_j A_ij = sum_j c_ij gradW R^T  (outer products accumulated)
    A_sum = jnp.einsum("nk,nki,nkj->nij", c, gradW, R)
    eye = jnp.eye(params.dim, dtype=jnp.float32)[None]
    D = eye + dt_rho * A_sum                       # I - dt/rho0 * (-sum A_ij)
    Dinv = jnp.linalg.inv(D)
    Dinv = jnp.where(fmask[..., None], Dinv, eye)

    # --- right-hand side (rigid neighbors move b; base_solver.py:334-346) ---
    v_dot_R = jnp.sum(p.vel[nbrs.idx] * R, axis=-1)
    denom = jnp.sum(R * R, axis=-1) + 0.01 * params.support_radius ** 2
    d2 = 2.0 * (params.dim + 2)
    cb = d2 * params.viscosity_b * params.density0 * p.rest_volume[nbrs.idx] \
        / p.density[:, None] * v_dot_R / denom
    b_rigid = jnp.sum(jnp.where(rigid_j[..., None], cb[..., None] * gradW, 0.0), axis=1)
    b = p.vel - params.dt * b_rigid / params.density0
    b = jnp.where(fmask, b, 0.0)

    def matvec(x):
        """(Ax)_i = x_i + dt/rho0 * Dinv_i sum_{fluid j} (-A_ij) x_j
        (base_solver.py:373-391; only fluid neighbors in the off-diagonal)."""
        xj = x[nbrs.idx]
        s = jnp.sum(R * xj, axis=-1)               # R . x_j
        contrib = jnp.where(fluid_j, -c * s, 0.0)  # scalar per pair
        acc = jnp.einsum("nk,nkd->nd", contrib, gradW)
        out = x + dt_rho * jnp.einsum("nij,nj->ni", Dinv, acc)
        return jnp.where(fmask, out, 0.0)

    # --- CG (base_solver.py:393-461) ---------------------------------------
    x0 = jnp.where(fmask, state.visc_x + p.vel, 0.0)   # warm start
    r0 = jnp.where(fmask, jnp.einsum("nij,nj->ni", Dinv, b) - matvec(x0), 0.0)

    def cond(carry):
        _, _, _, itr, err = carry
        return (err > params.cg_tol) & (itr < params.cg_max_iter)

    def body(carry):
        x, r, pdir, itr, _ = carry
        Ap = matvec(pdir)
        rr = jnp.sum(r * r)
        pAp = jnp.sum(pdir * Ap)
        alpha = jnp.where(pAp > 1e-18, rr / pAp, 0.0)
        x = x + alpha * pdir
        r_new = r - alpha * Ap
        rr_new = jnp.sum(r_new * r_new)
        beta = jnp.where(rr > 1e-18, rr_new / rr, 0.0)
        pdir = r_new + beta * pdir
        return x, r_new, pdir, itr + 1, jnp.sqrt(rr_new)

    init = (x0, r0, r0, jnp.int32(0), jnp.float32(jnp.inf))
    x, _, _, cg_iters, cg_err = jax.lax.while_loop(cond, body, init)

    # --- fold into acceleration (base_solver.py:509-517) --------------------
    v_sol = jnp.where(fmask, x, p.vel)
    a_v, rf, rt = common.viscosity_acceleration_standard(p, v_sol, rigid, nbrs, params)
    p = p.replace(acc=p.acc + a_v)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    state = state.replace(visc_x=jnp.where(fmask, x - p.vel, 0.0))
    return p, rigid, state
