"""DFSPH: divergence-free SPH (constant-density + divergence-free solvers).

Physics matches the reference DFSPHSolver (SPH/fluid_solvers/DFSPH.py):
- stiffness factor alpha                DFSPH.py:22-62
- density star / density derivative     DFSPH.py:65-127 (incl. the <20
  neighbor particle-deficiency guard and the max(*, 1.0)/max(*, 0.0) clamps)
- constant-density corrector            DFSPH.py:216-294 (tol 1e-4)
- divergence-free corrector             DFSPH.py:131-211 (tol 1e-3*rho0/dt)
- step ordering                         DFSPH.py:298-319

TPU-native: both correctors are ``lax.while_loop``s over the dense pair
engine, carrying (velocity, rigid wrench, error, iter) entirely on device —
the reference syncs a scalar to the host every solver iteration (its dominant
overhead). Per iteration only the changing fields (vel, kappa) are re-slabbed
(one packed gather).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_NONE, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState, SimState
from ..ops import kernels
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack
from . import common


def compute_alpha(p: ParticleState, env: PairEnv, sl: dict,
                  params: SimParams) -> jnp.ndarray:
    """alpha_i = 1 / (|sum_j V_j gradW|^2 + sum_{fluid j} |V_j gradW|^2),
    zero when the denominator is tiny (DFSPH.py:22-62). The squared-norm sum
    only counts fluid neighbors; the vector sum counts all."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        c = -cx.slab("rest_volume") * gw                    # grad_pj = c * R
        fluid_j = mask & (cx.slab("material") == MATERIAL_FLUID)
        out = {"sum_sq": cx.sum(c * c * d2, fluid_j)}
        for d in range(dim):
            out[f"vec{d}"] = cx.sum(c * R[d], mask)
        return out

    out = pair_exec.run(kern, env,
                        {"rest_volume": sl["rest_volume"],
                         "material": sl["material"]},
                        {"pos": p.pos}, params)
    denom = out["sum_sq"] + jnp.sum(out["vec"] * out["vec"], axis=-1)
    alpha = jnp.where(denom > 1e-5, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.where(p.material == MATERIAL_FLUID, alpha, 0.0)


def density_and_alpha(p: ParticleState, env: PairEnv, sl: dict,
                      params: SimParams):
    """Fused density summation + alpha factor (one pair pass instead of two;
    physics identical to compute_density + compute_alpha)."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        W = common._w_d2(d2, params)
        vj = cx.slab("rest_volume")
        gw = common._gw_coef(d2, params)
        c = -vj * gw
        fluid_j = mask & (cx.slab("material") == MATERIAL_FLUID)
        out = {"s": cx.sum(vj * W, mask),
               "sum_sq": cx.sum(c * c * d2, fluid_j)}
        for d in range(dim):
            out[f"vec{d}"] = cx.sum(c * R[d], mask)
        return out

    out = pair_exec.run(kern, env,
                        {"rest_volume": sl["rest_volume"],
                         "material": sl["material"]},
                        {"pos": p.pos}, params)
    dens = (p.rest_volume * kernels.W0(params.support_radius, params.dim,
                                       params.kernel_type) + out["s"]) * params.density0
    dens = jnp.where(p.material == MATERIAL_FLUID, dens, p.density)
    denom = out["sum_sq"] + jnp.sum(out["vec"] * out["vec"], axis=-1)
    alpha = jnp.where(denom > 1e-5, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    alpha = jnp.where(p.material == MATERIAL_FLUID, alpha, 0.0)
    return dens, alpha


def density_alpha_divergence(p: ParticleState, env: PairEnv, sl: dict,
                             params: SimParams):
    """density_and_alpha + the divergence solver's initial density
    derivative, all in ONE pair pass (they run back-to-back on the same env
    in the step; the derivative needs only pos/vel, not the new density).
    With rigid bodies the step-tail's rigid pseudo-volume sum rides along
    too (positions do not move between the resort and the step end, so its
    value is identical) — returned as the 4th element, else None.
    Physics identical to the unfused passes."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        W = common._w_d2(d2, params)
        vj = cx.slab("rest_volume")
        gw = common._gw_coef(d2, params)
        c = -vj * gw
        fluid_j = mask & (cx.slab("material") == MATERIAL_FLUID)
        vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
        dv_R = sum((vb[d] - vs[d]) * R[d] for d in range(dim))
        out = {"sd": cx.sum(vj * W, mask),
               "sum_sq": cx.sum(c * c * d2, fluid_j),
               "sv": cx.sum(vj * dv_R * gw, mask),
               "cnt": cx.sum(jnp.ones_like(d2), mask)}
        for d in range(dim):
            out[f"vec{d}"] = cx.sum(c * R[d], mask)
        if params.has_dynamic_rigid:
            # same-object kernel sum for rigid pseudo-volumes
            # (compute_rigid_particle_volume's kern; base_solver.py:105-123).
            # Static-only rigid scenes skip it: apply_rigid_volume writes
            # is_dynamic>0 rows only, so the per-step recompute is a no-op
            # there (walls keep their prepare-time volumes)
            same = cx.slab("object_id") == cx.blk("object_id")
            out["svol"] = cx.sum(cx.where(same, W, 0.0), mask)
        return out

    slabs = {"rest_volume": sl["rest_volume"], "material": sl["material"],
             "vel": slab_pack(env, {"v": p.vel})["v"]}
    fields = {"pos": p.pos, "vel": p.vel}
    if params.has_dynamic_rigid:
        slabs["object_id"] = sl["object_id"]
        fields["object_id"] = p.object_id
    out = pair_exec.run(kern, env, slabs, fields, params)
    dens = (p.rest_volume * kernels.W0(params.support_radius, params.dim,
                                       params.kernel_type)
            + out["sd"]) * params.density0
    dens = jnp.where(p.material == MATERIAL_FLUID, dens, p.density)
    denom = out["sum_sq"] + jnp.sum(out["vec"] * out["vec"], axis=-1)
    alpha = jnp.where(denom > 1e-5, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    alpha = jnp.where(p.material == MATERIAL_FLUID, alpha, 0.0)
    # derivative post (compute_density_derivative; DFSPH.py:65-87)
    adv = jnp.maximum(out["sv"], 0.0)
    min_nbrs = 20 if params.dim == 3 else 7
    adv = jnp.where(out["cnt"] < min_nbrs, 0.0, adv)
    deriv0 = jnp.where(p.material == MATERIAL_FLUID, adv, 0.0)
    return dens, alpha, deriv0, out.get("svol")


def _divergence_sum(p: ParticleState, vel: jnp.ndarray, vel_slab: jnp.ndarray,
                    env: PairEnv, sl: dict, params: SimParams,
                    with_count: bool = False):
    """sum_j V_j (v_i - v_j) . gradW_ij over all neighbors (DFSPH.py:90-101),
    optionally with the neighbor count for the deficiency guard."""
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = common._gw_coef(d2, params)
        vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
        dv_R = sum((vb[d] - vs[d]) * R[d] for d in range(dim))
        contrib = cx.slab("rest_volume") * dv_R * gw
        out = {"s": cx.sum(contrib, mask)}
        if with_count:
            out["cnt"] = cx.sum(jnp.ones_like(contrib), mask)
        return out

    out = pair_exec.run(kern, env,
                        {"rest_volume": sl["rest_volume"], "vel": vel_slab},
                        {"pos": p.pos, "vel": vel}, params)
    if with_count:
        return out["s"], out["cnt"]
    return out["s"]


def compute_density_derivative(p, vel, vel_slab, env, sl, params) -> jnp.ndarray:
    """(D rho/Dt)/rho0, clamped positive; zeroed on particle deficiency
    (< 20 neighbors in 3D, < 7 in 2D; DFSPH.py:65-87)."""
    s, cnt = _divergence_sum(p, vel, vel_slab, env, sl, params, with_count=True)
    adv = jnp.maximum(s, 0.0)
    min_nbrs = 20 if params.dim == 3 else 7
    adv = jnp.where(cnt < min_nbrs, 0.0, adv)
    return jnp.where(p.material == MATERIAL_FLUID, adv, 0.0)


def compute_density_star(p, vel, vel_slab, env, sl, params) -> jnp.ndarray:
    """rho*/rho0 = rho/rho0 + dt * divergence-sum, clamped >= 1 (DFSPH.py:104-114)."""
    s = _divergence_sum(p, vel, vel_slab, env, sl, params)
    star = jnp.maximum(p.density / params.density0 + params.dt * s, 1.0)
    return jnp.where(p.material == MATERIAL_FLUID, star, 0.0)


def warm_factor(p: ParticleState, params: SimParams) -> jnp.ndarray:
    """This step's warm-start strength (scalar or per-particle, traced).

    Static dfsph_warm_factor unless the adaptive knob is armed
    (params.dfsph_warm_factor_hi > 0): then a particle gets the stronger
    hi factor only when BOTH gates open —

    - global: carried max fluid density within dfsph_warm_gate of rest
      (closes during impact compression, the regime where a strong guess
      diverged in r4g: the solver cannot correct over-expansion, star is
      clamped >= 1, so overshoot leaves no corrective kappa behind);
    - local: the particle itself moves less than dfsph_warm_quiet_cfl
      particle diameters this step (r5d measured the global gate alone
      letting stale carries eject individual rest-state particles —
      see params.py).

    Costs one global masked max + one elementwise speed test."""
    wf = jnp.float32(params.dfsph_warm_factor)
    if params.dfsph_warm_factor_hi > 0.0:
        fluid_i = p.material == MATERIAL_FLUID
        rho_mx = common.global_max(
            jnp.where(fluid_i, p.density, 0.0), params)
        quiet_g = rho_mx <= params.dfsph_warm_gate * params.density0
        v2 = jnp.sum(p.vel * p.vel, axis=-1)
        v_lim = (params.dfsph_warm_quiet_cfl * params.particle_diameter
                 / params.dt)
        quiet_i = v2 <= jnp.float32(v_lim * v_lim)
        wf = jnp.where(quiet_g & quiet_i,
                       jnp.float32(params.dfsph_warm_factor_hi), wf)
    return wf


def _correction_outputs(cx, params: SimParams, pre: str = "") -> dict:
    """Kernel-body fragment of one corrector iteration (DFSPH.py:161-202 /
    245-283): velocity correction sums ``{pre}dv{d}`` and, with dynamic
    rigids, per-rigid-row wrench sums ``{pre}fp{d}``. Factored out so the
    warm-start correction can ride another pass's kernel (slab/block names:
    kappa, k_rho, rest_volume, material, rigid_dyn)."""
    eps = params.dfsph_eps * params.dt
    dim = params.dim
    # all divisions hoisted to per-particle precomputes (k_rho = kappa/rho)
    R, d2, mask = cx.geometry()
    gw = common._gw_coef(d2, params)
    vgw = cx.slab("rest_volume") * gw                  # grad_pj = vgw * R
    mat_j = cx.slab("material")
    k_i = cx.blk("kappa")
    k_j = cx.slab("kappa")
    kr_i = cx.blk("k_rho")
    kr_j = cx.slab("k_rho")
    fluid_j = mask & (mat_j == MATERIAL_FLUID) & (jnp.abs(k_i + k_j) > eps)
    rigid_j = mask & (mat_j == MATERIAL_RIGID) & (jnp.abs(k_i) > eps)
    coef = (cx.where(fluid_j, kr_i + kr_j, 0.0) +
            cx.where(rigid_j, kr_i, 0.0)) * params.density0 * vgw
    out = {f"{pre}dv{d}": cx.sum(-coef * R[d], fluid_j | rigid_j)
           for d in range(dim)}

    if params.has_dynamic_rigid:
        # wrench on rigid row r from fluid neighbor i (DFSPH.py:193-202)
        pair_ok = mask & (mat_j == MATERIAL_FLUID) & \
            (cx.blk("rigid_dyn") > 0) & (jnp.abs(k_j) > eps)
        c = -cx.blk("rest_volume") * kr_j * \
            params.density0 / params.dt * \
            (cx.slab("rest_volume") * params.density0) * gw
        c = cx.where(pair_ok, c, 0.0)
        for d in range(dim):
            out[f"{pre}fp{d}"] = cx.sum(c * R[d], pair_ok)
    return out


def _correction_reduce(out, p: ParticleState, rigid: RigidState,
                       params: SimParams, pre: str = ""):
    """Post-process _correction_outputs: mask dv to fluid rows, reduce the
    per-rigid-particle wrench sums into per-object wrenches."""
    fluid_i = p.material == MATERIAL_FLUID
    dv = jnp.where(fluid_i[:, None], out[f"{pre}dv"], 0.0)
    if not params.has_dynamic_rigid:
        return dv, jnp.zeros_like(rigid.force), jnp.zeros_like(rigid.torque)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    # one-hot MXU read, not a row gather: this runs inside BOTH corrector
    # while_loops on coupled scenes (rigid.com[obj] measured ~7 ns/element
    # on v5e — tools/obj_gather_bench.py)
    com_i = common.object_gather({"com": rigid.com}, obj,
                                 params.max_objects)["com"]
    arm = p.pos - com_i
    torque_pp = common.pair_cross(arm, out[f"{pre}fp"], params.dim)
    force, torque = common.reduce_wrench(out[f"{pre}fp"], torque_pp, p, params)
    return dv, force, torque


def _correction(
    p: ParticleState, rigid: RigidState, kappa: jnp.ndarray,
    kappa_slab: jnp.ndarray, env: PairEnv, sl: dict, params: SimParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Velocity correction dv and rigid wrench for one corrector iteration
    (DFSPH.py:161-202 / 245-283; both correctors share this form)."""
    rigid_dyn = ((p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)).astype(jnp.int32)
    if kappa_slab is None:
        kappa_slab = slab_pack(env, {"kappa": kappa})["kappa"]

    def kern(cx):
        return _correction_outputs(cx, params)

    k_rho = kappa / jnp.maximum(p.density, 1e-12)
    fields = {"pos": p.pos, "kappa": kappa, "k_rho": k_rho,
              "rest_volume": p.rest_volume}
    if params.has_dynamic_rigid:
        fields["rigid_dyn"] = rigid_dyn
    out = pair_exec.run(
        kern, env,
        {"rest_volume": sl["rest_volume"], "material": sl["material"],
         "kappa": kappa_slab, "k_rho": k_rho},
        fields, params)
    return _correction_reduce(out, p, rigid, params)


def nonpressure_warm_fused(
    p: ParticleState, rigid: RigidState, kappa_w: jnp.ndarray,
    env: PairEnv, sl: dict, params: SimParams,
):
    """Surface tension + standard viscosity + the warm-start density
    correction in ONE pair pass. The warm correction reads only
    pos/kappa/density (never velocity), so it is independent of the
    non-pressure pass and the sums are identical to running it separately —
    this saves one full pair pass per step on the warm-start path.
    Returns (a_nonpressure, visc_force, visc_torque, dv_warm, warm_force,
    warm_torque)."""
    def kern(cx):
        out = common._nonpressure_outputs(cx, params)
        out.update(_correction_outputs(cx, params, pre="w"))
        return out

    inv_rho = 1.0 / jnp.where(p.density > 0, p.density, 1.0)
    inv_rho_slab = jax.tree.map(
        lambda rho: 1.0 / jnp.where(rho > 0, rho, 1.0), sl["density"])
    k_rho = kappa_w / jnp.maximum(p.density, 1e-12)
    ks = slab_pack(env, {"kappa": kappa_w, "k_rho": k_rho})
    fields = {"pos": p.pos, "vel": p.vel, "mass": p.mass,
              "rest_volume": p.rest_volume, "inv_rho": inv_rho,
              "kappa": kappa_w, "k_rho": k_rho}
    if params.has_dynamic_rigid:
        fields["rigid_dyn"] = (
            (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
        ).astype(jnp.int32)
    out = pair_exec.run(
        kern, env,
        {"vel": sl["vel"], "material": sl["material"],
         "mass": sl["mass"], "rest_volume": sl["rest_volume"],
         "inv_rho": inv_rho_slab, "kappa": ks["kappa"], "k_rho": ks["k_rho"]},
        fields, params)
    a, vf, vt = common._nonpressure_reduce(out, p, rigid, params)
    dv, wf, wt = _correction_reduce(out, p, rigid, params, pre="w")
    return a, vf, vt, dv, wf, wt


def _avg_over_active(x: jnp.ndarray, p: ParticleState,
                     params: SimParams) -> jnp.ndarray:
    """Reference averages errors over *all* active particles, not just fluid
    (DFSPH.py:205-211, 285-294 divide by particle_num)."""
    n = jnp.maximum(common.global_sum(p.material != MATERIAL_NONE, params), 1)
    return common.global_sum(x, params) / n


def correct_density_error(
    p: ParticleState, rigid: RigidState, alpha: jnp.ndarray,
    env: PairEnv, sl: dict, params: SimParams,
    kappa0: jnp.ndarray = None,
    warm_pre: tuple = None,
    omega=None,
) -> Tuple[ParticleState, RigidState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Constant-density solver (DFSPH.py:225-243).

    ``omega``: over-relaxation on each iteration's kappa (see
    params.dfsph_omega); pass a traced scalar to sweep without recompiling
    (tools/omega_diag.py). None uses the static param.

    ``kappa0`` (params.dfsph_warm_start): the previous step's accumulated
    stiffness. The warm path applies one correction from 0.5*kappa0 BEFORE
    the first density probe — replacing the cold star0 pass and usually one
    corrector iteration at settled state — then iterates to the same
    tolerance as the cold path. Returns the accumulated stiffness for the
    next step's warm start (zeros on the cold path).

    ``warm_pre`` = (kappa_w, dv, force, torque): the warm correction already
    computed by a fused earlier pass (nonpressure_warm_fused) — same values,
    one fewer pair pass."""
    fluid_i = p.material == MATERIAL_FLUID
    vel0 = p.vel
    rf0 = jnp.zeros_like(rigid.force)
    rt0 = jnp.zeros_like(rigid.torque)
    kacc0 = jnp.zeros_like(alpha)
    itr0 = jnp.int32(0)
    if warm_pre is not None:
        kappa_w, dv, f, tq = warm_pre
        vel0 = vel0 + dv
        rf0, rt0, kacc0, itr0 = f, tq, kappa_w, jnp.int32(1)
    elif kappa0 is not None:
        kappa_w = jnp.where(
            fluid_i, jnp.maximum(warm_factor(p, params) * kappa0, 0.0), 0.0)
        dv, f, tq = _correction(p, rigid, kappa_w, None, env, sl, params)
        vel0 = vel0 + dv
        rf0, rt0, kacc0, itr0 = f, tq, kappa_w, jnp.int32(1)

    vslab0 = slab_pack(env, {"v": vel0})["v"]
    star0 = compute_density_star(p, vel0, vslab0, env, sl, params)
    if kappa0 is not None or warm_pre is not None:
        # warm path: the loop-entry error is real (the warm correction may
        # already satisfy the tolerance); cold path keeps the >=1-iteration
        # floor of the reference
        err0 = _avg_over_active(
            star0 - jnp.where(fluid_i, 1.0, 0.0), p, params)
    else:
        err0 = jnp.float32(jnp.inf)

    def cond(carry):
        _, _, _, _, itr, err, _ = carry
        return (itr < 1) | ((err > params.dfsph_max_error) &
                            (itr < params.dfsph_max_iter))

    om = params.dfsph_omega if omega is None else omega
    _apply_om = omega is not None or params.dfsph_omega != 1.0

    def body(carry):
        vel, star, rf, rt, itr, _, kacc = carry
        kappa = (star - 1.0) * alpha / params.dt
        if _apply_om:
            kappa = kappa * om
        ks = slab_pack(env, {"k": kappa})
        dv, f, tq = _correction(p, rigid, kappa, ks["k"], env, sl, params)
        vel = vel + dv
        vs = slab_pack(env, {"v": vel})["v"]
        star = compute_density_star(p, vel, vs, env, sl, params)
        err = _avg_over_active(
            star - jnp.where(fluid_i, 1.0, 0.0), p, params)
        return vel, star, rf + f, rt + tq, itr + 1, err, kacc + kappa

    init = (vel0, star0, rf0, rt0, itr0, err0, kacc0)
    vel, _, rf, rt, itr, err, kacc = jax.lax.while_loop(cond, body, init)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    return p.replace(vel=vel), rigid, itr, err, kacc


def correct_divergence_error(
    p: ParticleState, rigid: RigidState, alpha: jnp.ndarray,
    env: PairEnv, sl: dict, params: SimParams,
    deriv0: jnp.ndarray = None,
    kappa_v0: jnp.ndarray = None,
) -> Tuple[ParticleState, RigidState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Divergence-free solver (DFSPH.py:139-159). ``deriv0``: the initial
    density derivative when the caller already computed it (fused into the
    density/alpha pass — density_alpha_divergence).

    ``kappa_v0`` (params.dfsph_warm_start_div): the previous step's
    accumulated divergence stiffness. The warm path applies one correction
    from 0.5*kappa_v0 BEFORE the first derivative probe — worth it exactly
    where the cold solver iterates a lot (quasi-static pileups run 10+
    divergence iterations; the settled dam break runs 1, where this should
    stay off) — then iterates to the SAME tolerance as the cold path.
    Returns the accumulated stiffness for the next step (zeros when cold).
    """
    eta = params.dfsph_max_error_v * params.density0 / params.dt
    fluid_i = p.material == MATERIAL_FLUID
    vel0 = p.vel
    rf0 = jnp.zeros_like(rigid.force)
    rt0 = jnp.zeros_like(rigid.torque)
    kacc0 = jnp.zeros_like(alpha)
    itr0 = jnp.int32(0)
    err0 = jnp.float32(jnp.inf)
    if kappa_v0 is not None:
        # kappa_v = deriv*alpha >= 0 by construction; clamp like the density
        # warm start for robustness against stale negative noise
        kappa_w = jnp.where(
            fluid_i,
            jnp.maximum(warm_factor(p, params) * kappa_v0, 0.0), 0.0)
        dv, f, tq = _correction(p, rigid, kappa_w, None, env, sl, params)
        vel0 = vel0 + dv
        vslab0 = slab_pack(env, {"v": vel0})["v"]
        deriv0 = compute_density_derivative(p, vel0, vslab0, env, sl, params)
        # loop-entry error is real: the warm correction may already satisfy
        # the tolerance (the cold path keeps the reference's >=1-iteration
        # floor)
        err0 = _avg_over_active(params.density0 * deriv0, p, params)
        rf0, rt0, kacc0, itr0 = f, tq, kappa_w, jnp.int32(1)
    elif deriv0 is None:
        vslab0 = slab_pack(env, {"v": p.vel})["v"]
        deriv0 = compute_density_derivative(p, p.vel, vslab0, env, sl,
                                            params)

    def cond(carry):
        _, _, _, _, itr, err, _ = carry
        return (itr < 1) | ((err > eta) & (itr < params.dfsph_max_iter_v))

    def body(carry):
        vel, deriv, rf, rt, itr, _, kacc = carry
        kappa_v = deriv * alpha
        ks = slab_pack(env, {"k": kappa_v})
        dv, f, tq = _correction(p, rigid, kappa_v, ks["k"], env, sl, params)
        vel = vel + dv
        vs = slab_pack(env, {"v": vel})["v"]
        deriv = compute_density_derivative(p, vel, vs, env, sl, params)
        err = _avg_over_active(params.density0 * deriv, p, params)
        return vel, deriv, rf + f, rt + tq, itr + 1, err, kacc + kappa_v

    init = (vel0, deriv0, rf0, rt0, itr0, err0, kacc0)
    vel, _, rf, rt, itr, err, kacc = jax.lax.while_loop(cond, body, init)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    return p.replace(vel=vel), rigid, itr, err, kacc


def _nonpressure_and_density_solve(p, rigid, state, env, sl, params, plumbing):
    """Non-pressure accelerations + velocity update + constant-density solve
    (the first half of DFSPH.py:298-319's ordering). On the warm-start path
    with standard viscosity, the warm correction rides the non-pressure pass
    (nonpressure_warm_fused) — one fewer pair pass per step, identical sums."""
    alpha = state.dfsph_alpha
    if params.dfsph_warm_start and params.viscosity_method == "standard":
        fluid_i = p.material == MATERIAL_FLUID
        kappa_w = jnp.where(
            fluid_i,
            jnp.maximum(warm_factor(p, params) * state.dfsph_kappa, 0.0),
            0.0)
        a_np, vf, vt, dv, wf, wt = nonpressure_warm_fused(
            p, rigid, kappa_w, env, sl, params)
        acc = common.gravity_acceleration(p, params) + a_np
        rigid = rigid.replace(force=rigid.force + vf,
                              torque=rigid.torque + vt)
        p = p.replace(acc=acc)
        p = common.update_fluid_velocity(p, params)
        return correct_density_error(p, rigid, alpha, env, sl, params,
                                     warm_pre=(kappa_w, dv, wf, wt))
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, env, sl, state,
                                                  params)
    p = common.update_fluid_velocity(p, params)
    return correct_density_error(
        p, rigid, alpha, env, sl, params,
        kappa0=state.dfsph_kappa if params.dfsph_warm_start else None)


def segment_a(state: SimState, params: SimParams, plumbing
              ) -> tuple[SimState, dict]:
    """First half of a DFSPH step for executors that cannot cache the pair
    env across the step boundary (the spatial shard_map path): density/alpha
    recompute on entry — identical values to the cached ones, since positions
    have not moved since the previous step's own recompute."""
    state, env = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    dens, alpha = density_and_alpha(p, env, sl, params)
    p = p.replace(density=dens)
    sl["density"] = slab_pack(env, {"d": dens})["d"]
    state = state.replace(particles=p, dfsph_alpha=alpha)

    p, rigid, itr_d, err_d, kacc = _nonpressure_and_density_solve(
        p, rigid, state, env, sl, params, plumbing)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    if params.dfsph_warm_start:
        state = state.replace(dfsph_kappa=kacc)
    state = plumbing.rigid_mid(state, env, params)
    p = common.enforce_domain_boundary(state.particles, params, MATERIAL_FLUID)
    state = state.replace(particles=p)
    return state, dict(solver_iters=itr_d,
                       solver_err=err_d * params.density0)


def segment_b(state: SimState, params: SimParams, plumbing
              ) -> tuple[SimState, dict]:
    """Second half (post mid-step resort): divergence-free solver + tail."""
    state, env = plumbing.neighbor_prep(state, params)
    p = state.particles
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    dens, alpha, deriv0, svol = density_alpha_divergence(p, env, sl, params)
    p = p.replace(density=dens)
    sl["density"] = slab_pack(env, {"d": dens})["d"]
    p, rigid, itr_v, err_v, kacc_v = correct_divergence_error(
        p, state.rigid, alpha, env, sl, params, deriv0=deriv0,
        kappa_v0=state.dfsph_kappa_v if params.dfsph_warm_start_div else None)
    if params.has_dynamic_rigid:
        p = common.apply_rigid_volume(p, svol, params)
    state = state.replace(
        particles=p, rigid=rigid, dfsph_alpha=alpha,
        t=state.t + params.dt, step_count=state.step_count + 1,
    )
    if params.dfsph_warm_start_div:
        state = state.replace(dfsph_kappa_v=kacc_v)
    diag = plumbing.diagnostics(state, env, params, extra=dict(
        div_iters=itr_v, div_err=err_v))
    return state, diag


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One DFSPH step (DFSPH.py:298-319). Density/alpha/pair-env for the
    start of the step come from the end of the previous one (prepare seeds
    them, matching DFSPH.py:321-324)."""
    p, rigid = state.particles, state.rigid
    env0 = state.cached_neighbors
    sl0 = common.particle_slabs(env0, p, common.STATIC_SLAB_KEYS)

    p, rigid, itr_d, err_d, kacc = _nonpressure_and_density_solve(
        p, rigid, state, env0, sl0, params, plumbing)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    if params.dfsph_warm_start:
        state = state.replace(dfsph_kappa=kacc)
    state = plumbing.rigid_mid(state, env0, params)
    p, rigid = state.particles, state.rigid

    p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)
    state = state.replace(particles=p)

    state, env = plumbing.neighbor_prep(state, params)
    p = state.particles
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    dens, alpha, deriv0, svol = density_alpha_divergence(p, env, sl, params)
    p = p.replace(density=dens)
    sl["density"] = slab_pack(env, {"d": p.density})["d"]
    p, rigid, itr_v, err_v, kacc_v = correct_divergence_error(
        p, state.rigid, alpha, env, sl, params, deriv0=deriv0,
        kappa_v0=state.dfsph_kappa_v if params.dfsph_warm_start_div else None)

    # base step wrapper tail: time += dt, rigid volumes (base_solver.py:692-696)
    if params.has_dynamic_rigid:
        p = common.apply_rigid_volume(p, svol, params)
    state = state.replace(
        particles=p, rigid=rigid, dfsph_alpha=alpha, cached_neighbors=env,
        t=state.t + params.dt, step_count=state.step_count + 1,
    )
    if params.dfsph_warm_start_div:
        state = state.replace(dfsph_kappa_v=kacc_v)
    diag = plumbing.diagnostics(state, env, params, extra=dict(
        solver_iters=itr_d, solver_err=err_d * params.density0,
        div_iters=itr_v, div_err=err_v,
    ))
    return state, diag
