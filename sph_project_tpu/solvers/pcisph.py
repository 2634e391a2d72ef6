"""PCISPH: predictive-corrective incompressible SPH.

Physics matches the reference PCISPHSolver (SPH/fluid_solvers/PCISPH.py):
- precomputed stiffness k_PCI from an ideal lattice   PCISPH.py:128-151
- prediction-correction loop                          PCISPH.py:110-125
- step ordering                                       PCISPH.py:165-190

The host `while` loop becomes a `lax.while_loop` over the dense pair engine;
the density error for the break test is the one measured at the *start* of
each iteration, exactly like the reference (density_error is set by
compute_density_star before the pressure update).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import MATERIAL_FLUID, SimParams
from ..core.state import SimState
from ..ops import kernels
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack
from . import common


def compute_pcisph_k(params: SimParams) -> float:
    """Stiffness from ideal-lattice kernel-gradient sums (PCISPH.py:128-151).
    Pure function of static params — evaluated once on the host with numpy.

    The lattice honors ``params.dim``: in 2D the sums run over a 2D lattice
    with the 2D kernel normalization. (The reference's kernel hardcodes a 3D
    lattice, PCISPH.py:141-143, but ships no 2D PCISPH scene; mixing the 2D
    kernel constant with a 3D lattice would make k inconsistent.)"""
    import itertools

    h = params.support_radius
    dim = params.dim
    diam = params.particle_diameter * 0.97
    max_i = int(h / diam) + 1
    sum_grad = np.zeros(dim)
    sum_grad2 = 0.0
    k = 8.0 / math.pi if dim == 3 else 40.0 / 7.0 / math.pi
    k = 6.0 * k / h ** dim
    rng = range(-max_i, max_i + 1)
    for idx in itertools.product(rng, repeat=dim):
        x = -np.asarray(idx, np.float64) * diam
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


def _density_star_predicted(p, pred_pos, pred_slab, env: PairEnv, sl: dict,
                            params: SimParams):
    """rho* from predicted fluid positions; rigid neighbors keep their actual
    positions (PCISPH.py:48-62). Neighbor candidacy still comes from the
    original-position windows, like the reference's for_all_neighbors."""
    dim = params.dim

    def kern(cx):
        _, _, mask = cx.geometry()                 # candidacy: original pos
        fluid_j = cx.slab("material") == MATERIAL_FLUID
        d2p = 0.0
        for d in range(dim):
            pj = cx.where(fluid_j, cx.slab(f"pred{d}"), cx.slab(f"pos{d}"))
            rp = cx.blk(f"pred{d}") - pj
            d2p = d2p + rp * rp
        W = kernels.W(jnp.sqrt(d2p), params.support_radius, params.dim,
                      params.kernel_type)
        return {"s": cx.sum(cx.slab("rest_volume") * W, mask)}

    ratio = pair_exec.run(
        kern, env,
        {"material": sl["material"], "rest_volume": sl["rest_volume"],
         "pred": pred_slab},
        {"pos": p.pos, "pred": pred_pos}, params)["s"]
    fluid_i = p.material == MATERIAL_FLUID
    star = jnp.where(fluid_i, ratio * params.density0, 0.0)
    nf = jnp.maximum(common.global_sum(fluid_i, params), 1)
    err = common.global_sum(
        jnp.where(fluid_i, jnp.maximum(ratio - 1.0, 0.0), 0.0), params) / nf
    return star, err


def refine(p, rigid, env: PairEnv, sl: dict, params: SimParams, k_pci: float):
    """The prediction-correction loop (PCISPH.py:110-125). Returns
    (pressure, iterations, final density error)."""
    fluid = (p.material == MATERIAL_FLUID)[:, None]

    def cond(carry):
        _, _, _, itr, err = carry
        return (itr < 1) | ((err >= params.pcisph_eta) & (itr < params.pcisph_max_iter))

    def body(carry):
        pressure, pred_v, pred_x, itr, _ = carry
        pred_slab = slab_pack(env, {"x": pred_x})["x"]
        star, err = _density_star_predicted(p, pred_x, pred_slab, env, sl, params)
        pressure = pressure + k_pci * (params.density0 - star)
        pressure = jnp.where(p.material == MATERIAL_FLUID,
                             jnp.maximum(pressure, 0.0), 0.0)
        pr_slab = slab_pack(env, {"pr": pressure})["pr"]
        p_acc, _, _ = common.pressure_acceleration(
            p, rigid, env, sl, params, pressure=pressure,
            pressure_slab=pr_slab, with_wrench=False)
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

    state, env = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    p = p.replace(density=common.compute_density(p, env, sl, params))
    sl["density"] = slab_pack(env, {"d": p.density})["d"]
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, env, sl, state, params)

    pressure, itr, err = refine(p, rigid, env, sl, params, k_pci)
    p = p.replace(pressure=pressure)
    sl["pressure"] = slab_pack(env, {"pr": pressure})["pr"]

    p = common.update_fluid_velocity(p, params)
    acc, rf, rt = common.pressure_acceleration(
        p, rigid, env, sl, params, with_wrench=params.has_dynamic_rigid)
    p = p.replace(acc=acc)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
    p = common.update_fluid_velocity(p, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    state = plumbing.rigid_and_tail(state, env, sl, params)
    diag = plumbing.diagnostics(state, env, params, extra=dict(
        solver_iters=itr, solver_err=err * params.density0))
    return state, diag
