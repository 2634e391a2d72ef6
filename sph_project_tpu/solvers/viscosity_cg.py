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

TPU-native: the CG driver is a ``lax.while_loop`` with on-device dot products
(the reference reads the residual back to the host every iteration); each
matvec is one slab re-pack of the search direction plus a chunked dense pair
reduction — the A_ij structure (scalar c_ij times gradW⊗R) means no
(pairs, 3, 3) matrices ever materialize.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState, SimState
from ..ops.pairs import PairEnv, run_blocked, slab_pack
from . import common


def implicit_viscosity_solve(
    p: ParticleState, rigid: RigidState, state: SimState,
    env: PairEnv, sl: dict, params: SimParams,
) -> Tuple[ParticleState, RigidState, SimState]:
    """Solve (I - dt/rho0 A) v_new = b, then fold the result into the
    acceleration. Returns (particles with updated acc, rigid with wrench,
    state with next warm start)."""
    fluid_i = p.material == MATERIAL_FLUID
    fmask = fluid_i[:, None]
    dt_rho = params.dt / params.density0
    d2c = 2.0 * (params.dim + 2)
    rho_i_safe = jnp.where(p.density > 0, p.density, 1.0)

    def _cij(ctx, sl_c, f_c, d2, mask):
        """A_ij = c * (gradW ⊗ R) coefficient (base_solver.py:348-371)."""
        denom = d2 + 0.01 * params.support_radius ** 2
        mat_j = sl_c["material"][:, None, :]
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        rho_j = jnp.maximum(sl_c["density"], 1e-12)[:, None, :]
        rho_i = f_c["rho_i"][:, :, None]
        m_ij = 0.5 * (f_c["mass"][:, :, None] + sl_c["mass"][:, None, :])
        m_b = params.density0 * sl_c["rest_volume"][:, None, :]
        c_f = -d2c * params.viscosity * m_ij / rho_j / denom
        c_b = -d2c * params.viscosity_b * m_b / rho_i / denom
        return (jnp.where(fluid_j, c_f, 0.0) + jnp.where(rigid_j, c_b, 0.0),
                fluid_j, rigid_j)

    base_slabs = {"material": sl["material"], "density": sl["density"],
                  "mass": sl["mass"], "rest_volume": sl["rest_volume"],
                  "vel": sl["vel"]}
    base_fields = {"pos": p.pos, "rho_i": rho_i_safe, "mass": p.mass}

    # --- preconditioner D_i + rhs b in one pass ------------------------------
    def prep_kern(ctx, sl_c, f_c):
        R, d2, mask = ctx.geometry(params)
        gradW = common._gradwfn(R, d2, params)
        c, fluid_j, rigid_j = _cij(ctx, sl_c, f_c, d2, mask)
        outer = gradW[..., :, None] * R[..., None, :]
        A_sum = ctx.sum_w(c[..., None, None] * outer, mask)
        # rigid neighbors move b (base_solver.py:334-346)
        denom = d2 + 0.01 * params.support_radius ** 2
        v_dot_R = jnp.sum(sl_c["vel"][:, None, :, :] * R, axis=-1)
        m_b = params.density0 * sl_c["rest_volume"][:, None, :]
        cb = d2c * params.viscosity_b * m_b / f_c["rho_i"][:, :, None] * \
            v_dot_R / denom
        b_rigid = ctx.sum_w(jnp.where(rigid_j[..., None],
                                      cb[..., None] * gradW, 0.0), rigid_j)
        return dict(A_sum=A_sum, b_rigid=b_rigid)

    prep = run_blocked(prep_kern, env, base_slabs, base_fields, params)
    eye = jnp.eye(params.dim, dtype=jnp.float32)[None]
    D = eye + dt_rho * prep["A_sum"]
    Dinv = jnp.linalg.inv(D)
    Dinv = jnp.where(fmask[..., None], Dinv, eye)
    b = jnp.where(fmask, p.vel - params.dt * prep["b_rigid"] / params.density0, 0.0)

    def matvec(x):
        """(Ax)_i = x_i + dt/rho0 * Dinv_i sum_{fluid j} (-A_ij) x_j
        (base_solver.py:373-391; only fluid neighbors off-diagonal)."""
        xs = slab_pack(env, {"x": x})["x"]

        def kern(ctx, sl_c, f_c):
            R, d2, mask = ctx.geometry(params)
            gradW = common._gradwfn(R, d2, params)
            c, fluid_j, _ = _cij(ctx, sl_c, f_c, d2, mask)
            s = jnp.sum(R * sl_c["x"][:, None, :, :], axis=-1)
            contrib = jnp.where(fluid_j, -c * s, 0.0)
            return ctx.sum_w(contrib[..., None] * gradW, fluid_j)

        acc = run_blocked(kern, env, dict(base_slabs, x=xs), base_fields, params)
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
    v_sol_slab = slab_pack(env, {"v": v_sol})["v"]
    a_v, rf, rt = common.viscosity_acceleration_standard(
        p, v_sol, rigid, env, sl, params, vel_slab=v_sol_slab)
    p = p.replace(acc=p.acc + a_v)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    state = state.replace(visc_x=jnp.where(fmask, x - p.vel, 0.0))
    return p, rigid, state
