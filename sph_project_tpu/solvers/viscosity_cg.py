"""Implicit viscosity: matrix-free block-Jacobi-preconditioned CG.

Physics matches the reference's implicit solver (base_solver.py:280-518),
itself after Weiler et al. 2018 "A Physically Consistent Implicit Viscosity
Solver for SPH Fluids":

- system matrix rows A_ij = c_ij * (gradW (x) R) with the fluid/rigid
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
matvec is one component pair pass (ops/pair_exec.py) — the A_ij structure
(scalar c_ij times gradW (x) R) means no (pairs, 3, 3) matrices materialize.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState, SimState
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack
from . import common


def implicit_viscosity_solve(
    p: ParticleState, rigid: RigidState, state: SimState,
    env: PairEnv, sl: dict, params: SimParams,
) -> Tuple[ParticleState, RigidState, SimState]:
    """Solve (I - dt/rho0 A) v_new = b, then fold the result into the
    acceleration."""
    dim = params.dim
    fluid_i = p.material == MATERIAL_FLUID
    fmask = fluid_i[:, None]
    dt_rho = params.dt / params.density0
    d2c = 2.0 * (params.dim + 2)
    inv_rho_i = 1.0 / jnp.where(p.density > 0, p.density, 1.0)

    def cij(cx, d2, mask):
        """A_ij = c * (gradW (x) R) coefficient (base_solver.py:348-371)."""
        denom = d2 + 0.01 * params.support_radius ** 2
        inv_denom = 1.0 / denom
        mat_j = cx.slab("material")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        rho_j = cx.slab("density")
        rho_j = cx.where(rho_j > 0, rho_j, 1.0)
        m_ij = 0.5 * (cx.blk("mass") + cx.slab("mass"))
        m_b = params.density0 * cx.slab("rest_volume")
        c_f = -d2c * params.viscosity * m_ij / rho_j * inv_denom
        c_b = -d2c * params.viscosity_b * m_b * cx.blk("inv_rho_i") * inv_denom
        return (cx.where(fluid_j, c_f, 0.0) + cx.where(rigid_j, c_b, 0.0),
                fluid_j, rigid_j, inv_denom)

    base_slabs = {"material": sl["material"], "density": sl["density"],
                  "mass": sl["mass"], "rest_volume": sl["rest_volume"],
                  "vel": sl["vel"]}
    base_fields = {"pos": p.pos, "inv_rho_i": inv_rho_i, "mass": p.mass}

    # --- preconditioner D_i + rhs b in one pass ------------------------------
    def prep_kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        c, fluid_j, rigid_j, inv_denom = cij(cx, d2, mask)
        cg = c * gw
        out = {}
        # sum_j A_ij = sum_j cg * (R (x) R): symmetric dim x dim per particle
        ax = "xyz"
        for a in range(dim):
            for b2 in range(a, dim):
                out[f"A{ax[a]}{ax[b2]}"] = cx.sum(cg * R[a] * R[b2], mask)
        # rigid neighbors move b (base_solver.py:334-346)
        vs = cx.vec_slab("vel")
        v_dot_R = sum(vs[d] * R[d] for d in range(dim))
        cb = d2c * params.viscosity_b * params.density0 * \
            cx.slab("rest_volume") * cx.blk("inv_rho_i") * v_dot_R * \
            inv_denom * gw
        cb = cx.where(rigid_j, cb, 0.0)
        for d in range(dim):
            out[f"br{d}"] = cx.sum(cb * R[d], rigid_j)
        return out

    prep = pair_exec.run(prep_kern, env, base_slabs, base_fields, params)
    ax = "xyz"
    A_sum = jnp.zeros((p.pos.shape[0], dim, dim), jnp.float32)
    for a in range(dim):
        for b2 in range(a, dim):
            A_sum = A_sum.at[:, a, b2].set(prep[f"A{ax[a]}{ax[b2]}"])
            if a != b2:
                A_sum = A_sum.at[:, b2, a].set(prep[f"A{ax[a]}{ax[b2]}"])
    eye = jnp.eye(dim, dtype=jnp.float32)[None]
    D = eye + dt_rho * A_sum
    Dinv = jnp.linalg.inv(D)
    Dinv = jnp.where(fmask[..., None], Dinv, eye)
    b = jnp.where(fmask, p.vel - params.dt * prep["br"] / params.density0, 0.0)

    def matvec(x):
        """(Ax)_i = x_i + dt/rho0 * Dinv_i sum_{fluid j} (-A_ij) x_j
        (base_solver.py:373-391; only fluid neighbors off-diagonal)."""
        def kern(cx):
            R, d2, mask = cx.geometry()
            gw = common._gw_coef(d2, params)
            c, fluid_j, _, _ = cij(cx, d2, mask)
            xs = cx.vec_slab("x")
            s = sum(R[d] * xs[d] for d in range(dim))
            contrib = cx.where(fluid_j, -c * gw * s, 0.0)
            return {f"acc{d}": cx.sum(contrib * R[d], fluid_j)
                    for d in range(dim)}

        acc = pair_exec.run(kern, env, dict(base_slabs, x=x), base_fields,
                            params)["acc"]
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
        rr = common.global_sum(r * r, params)
        pAp = common.global_sum(pdir * Ap, params)
        alpha = jnp.where(pAp > 1e-18, rr / pAp, 0.0)
        x = x + alpha * pdir
        r_new = r - alpha * Ap
        rr_new = common.global_sum(r_new * r_new, params)
        beta = jnp.where(rr > 1e-18, rr_new / rr, 0.0)
        pdir = r_new + beta * pdir
        return x, r_new, pdir, itr + 1, jnp.sqrt(rr_new)

    init = (x0, r0, r0, jnp.int32(0), jnp.float32(jnp.inf))
    x, _, _, cg_iters, cg_err = jax.lax.while_loop(cond, body, init)

    # --- fold into acceleration (base_solver.py:509-517) --------------------
    v_sol = jnp.where(fmask, x, p.vel)
    v_slab = slab_pack(env, {"v": v_sol})["v"]
    a_v, rf, rt = common.viscosity_acceleration_standard(
        p, v_sol, rigid, env, sl, params, vel_slab=v_slab)
    p = p.replace(acc=p.acc + a_v)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    state = state.replace(visc_x=jnp.where(fmask, x - p.vel, 0.0))
    return p, rigid, state
