"""Shared SPH operators over the dense blocked pair engine (ops/pairs.py).

Physics matches the reference's BaseSolver (SPH/fluid_solvers/base_solver.py in
jason-huang03/SPH_Project):

- density summation           base_solver.py:521-541
- gravity / surface tension   base_solver.py:202-229
- standard viscosity          base_solver.py:231-278
- pressure acceleration +
  Akinci rigid force/torque   base_solver.py:135-187
- rigid particle pseudo-volume base_solver.py:105-123
- domain boundary clamp       base_solver.py:543-611
- semi-implicit Euler + emitter base_solver.py:642-677

Implementation notes (TPU-native):
- every "for_all_neighbors + atomics" kernel is a masked dense reduction over
  per-block contiguous windows (see ops/pairs.py for why — XLA's random
  gather runs at scalar rate, contiguous slab fetches at ~1us/slice)
- ops receive a ``sl`` dict of slab-gathered neighbor fields so one packed
  gather serves a whole pass
- fluid->rigid wrenches are accumulated on the RIGID particle's row (pair
  symmetry) and reduced with N-length per-component segment sums — never an
  (N*K)-pair scatter
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState
from ..ops import kernels
from ..ops import pair_exec
from ..ops.pairs import PairEnv, slab_pack

# slab keys used by the standard per-step passes (pressure slabs are packed
# by the steps that need them, after the EOS/solve that produces them)
STATIC_SLAB_KEYS = ("vel", "mass", "density", "rest_volume",
                    "material", "object_id")


def particle_slabs(env: PairEnv, p: ParticleState, keys) -> dict:
    """One packed slab gather for the requested ParticleState fields."""
    return slab_pack(env, {k: getattr(p, k) for k in keys})


def global_sum(x, params: SimParams):
    """Sum over all particles — across every shard when the step runs inside
    shard_map (the solver-loop residuals and CG dot products must agree on
    every device for the while_loop conditions to stay in lockstep)."""
    s = jnp.sum(x)
    if params.spmd_axis:
        s = jax.lax.psum(s, params.spmd_axis)
    return s


def global_max(x, params: SimParams):
    m = jnp.max(x)
    if params.spmd_axis:
        m = jax.lax.pmax(m, params.spmd_axis)
    return m


def global_wrench(force, torque, params: SimParams):
    """Per-object wrench tables summed across shards (each shard accumulates
    only its local particles' contributions)."""
    if params.spmd_axis:
        force = jax.lax.psum(force, params.spmd_axis)
        torque = jax.lax.psum(torque, params.spmd_axis)
    return force, torque


def pair_cross(a: jnp.ndarray, b: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Cross product with the 2D scalar-torque convention."""
    if dim == 3:
        return jnp.cross(a, b)
    return (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])[..., None]


def _onehot_obj(obj: jnp.ndarray, O: int,
                sel: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N, O) f32 one-hot of the per-particle object id; rows with an
    out-of-range id (or sel=False) are all-zero."""
    eq = obj[:, None] == jnp.arange(O, dtype=obj.dtype)[None]
    if sel is not None:
        eq = eq & sel[:, None]
    return eq.astype(jnp.float32)


def object_gather(tables: dict, obj: jnp.ndarray, O: int) -> dict:
    """``{k: t[obj] for k, t in tables}`` for small (O, ...) per-object
    tables, via ONE one-hot MXU contraction.

    XLA lowers ``t[obj]`` to a row gather running at ~7 ns/element on TPU —
    measured 88 ms for a (1M, 22) read on v5e vs 0.25 ms for the one-hot
    dot (tools/obj_gather_bench.py). The dot is EXACT: each one-hot row has
    a single 1.0, and HIGHEST precision reconstructs every f32 table entry
    exactly from its bf16 triple. Int/bool tables ride the f32 path and are
    rounded back (exact for the small ids/flags stored in RigidState).
    """
    names = sorted(tables)
    cols, meta = [], []
    for k in names:
        t = tables[k]
        flat = t.reshape(O, -1).astype(jnp.float32)
        meta.append((k, t.shape[1:], t.dtype, flat.shape[1]))
        cols.append(flat)
    mat = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    out = jax.lax.dot_general(
        _onehot_obj(obj, O), mat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    res, off = {}, 0
    for k, shp, dt, w in meta:
        v = out[:, off:off + w].reshape((obj.shape[0],) + shp)
        if jnp.issubdtype(dt, jnp.integer) or dt == jnp.bool_:
            v = jnp.round(v).astype(dt)
        res[k] = v
        off += w
    return res


def object_reduce(vals: dict, obj: jnp.ndarray, O: int,
                  sel: jnp.ndarray | None = None) -> dict:
    """Per-object sums of per-particle rows ((N,) / (N, d)) via the
    transposed one-hot contraction — segment_sum's scatter-add measured
    26 ms for (1M, 3) on v5e vs 0.24 ms for the dot. Rows with sel=False
    or an out-of-range id contribute nothing. Sum ORDER differs from
    segment_sum (MXU tile accumulation): equal to within normal f32
    reduction reassociation, which the wrench sums tolerate (the reference
    accumulates them with unordered atomics)."""
    names = sorted(vals)
    cols, meta = [], []
    for k in names:
        v = vals[k]
        flat = v.reshape(v.shape[0], -1).astype(jnp.float32)
        meta.append((k, v.shape[1:], flat.shape[1]))
        cols.append(flat)
    mat = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    out = jax.lax.dot_general(
        _onehot_obj(obj, O, sel), mat, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    res, off = {}, 0
    for k, shp, w in meta:
        res[k] = out[:, off:off + w].reshape((O,) + shp)
        off += w
    return res


def reduce_wrench(
    force_pp: jnp.ndarray,         # (N, dim) per-particle force on its body
    torque_pp: jnp.ndarray,        # (N, dim|1) per-particle torque
    p: ParticleState, params: SimParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum per-rigid-particle wrenches into per-object wrenches (the
    reference's rigid_body_forces[obj] += atomics, base_solver.py:174-187)."""
    O = params.max_objects
    sel = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0) & (p.object_id >= 0)
    out = object_reduce({"f": force_pp, "t": torque_pp},
                        jnp.clip(p.object_id, 0, O - 1), O, sel=sel)
    return global_wrench(out["f"], out["t"], params)


def _w_d2(d2, params):
    if params.kernel_type == "cubic":
        w, _ = kernels.cubic_w_gw_d2(d2, params.support_radius, params.dim,
                                     need_gw=False)
        return w
    return kernels.W(jnp.sqrt(d2), params.support_radius, params.dim,
                     params.kernel_type)


def _gw_coef(d2, params):
    if params.kernel_type == "cubic":
        _, gw = kernels.cubic_w_gw_d2(d2, params.support_radius, params.dim,
                                      need_w=False)
        return gw
    return kernels.grad_W_coef(jnp.sqrt(d2), params.support_radius,
                               params.dim, params.kernel_type)



# ---------------------------------------------------------------------------
# Rigid particle pseudo-volume (Akinci boundary sampling)
# ---------------------------------------------------------------------------

def compute_rigid_particle_volume(p: ParticleState, env: PairEnv, sl: dict,
                                  params: SimParams,
                                  pos_slab=None) -> ParticleState:
    """V_b = 1 / sum_k W_bk over *same-object* neighbors (plus self W(0));
    mass = rho0 * V_b; rigid particles at/below g_upper only
    (base_solver.py:105-123). Pass fresh slabbed positions via ``pos_slab``
    (an (NB, W, dim) array) when called after positions moved."""
    def kern(cx):
        pos_key = "posf" if cx.has_slab("posf0") else "pos"
        _, d2, mask = cx.geometry(pos_blk="pos", pos_slab=pos_key)
        same = cx.slab("object_id") == cx.blk("object_id")
        W = _w_d2(d2, params)
        return {"s": cx.sum(cx.where(same, W, 0.0), mask)}

    slabs = {"object_id": sl["object_id"]}
    if pos_slab is not None:
        slabs["posf"] = pos_slab
    s = pair_exec.run(kern, env, slabs,
                      {"pos": p.pos, "object_id": p.object_id}, params)["s"]
    return apply_rigid_volume(p, s, params)


def apply_rigid_volume(p: ParticleState, s: jnp.ndarray,
                       params: SimParams) -> ParticleState:
    """Fold a same-object kernel sum into rigid pseudo-volumes/masses
    (the tail of compute_rigid_particle_volume; reusable by fused passes
    that produce the sum as one of several outputs)."""
    denom = kernels.W0(params.support_radius, params.dim, params.kernel_type) + s
    vol = 1.0 / jnp.maximum(denom, 1e-30)
    # per-step only DYNAMIC rigid particles: static walls keep the volumes
    # computed at prepare (they never move, so the same-object sums are
    # constant; the reference recomputes the same value each step)
    sel = (p.material == MATERIAL_RIGID) & (p.pos[:, 1] <= params.g_upper) & \
        (p.is_dynamic > 0)
    return p.replace(
        rest_volume=jnp.where(sel, vol, p.rest_volume),
        mass=jnp.where(sel, params.density0 * vol, p.mass),
    )




def compute_rigid_volume_fixedk(p: ParticleState, params: SimParams) -> ParticleState:
    """Prepare-time Akinci volumes for ALL rigid particles via the fixed-K
    neighbor-list path (one-time cost; the dense window engine exempts pure
    static-wall blocks from its big-window tier, so their volumes must be
    seeded here)."""
    from ..ops import neighbors as nblib

    active = p.material != 0
    cells = nblib.flat_cell_ids(p.pos, active, params)
    # state is already cell-sorted by the caller (neighbor_prep)
    nbrs = nblib.build_neighbors(p.pos, cells, params)
    R = p.pos[:, None, :] - p.pos[nbrs.idx]
    dist = jnp.linalg.norm(R, axis=-1)
    same = p.object_id[nbrs.idx] == p.object_id[:, None]
    W = jnp.where(nbrs.mask & same,
                  kernels.W(dist, params.support_radius, params.dim,
                            params.kernel_type), 0.0)
    denom = kernels.W0(params.support_radius, params.dim,
                       params.kernel_type) + jnp.sum(W, axis=1)
    vol = 1.0 / jnp.maximum(denom, 1e-30)
    sel = (p.material == MATERIAL_RIGID) & (p.pos[:, 1] <= params.g_upper)
    return p.replace(
        rest_volume=jnp.where(sel, vol, p.rest_volume),
        mass=jnp.where(sel, params.density0 * vol, p.mass),
    )


# ---------------------------------------------------------------------------
# Density
# ---------------------------------------------------------------------------

def compute_density(p: ParticleState, env: PairEnv, sl: dict,
                    params: SimParams) -> jnp.ndarray:
    """rho_i = rho0 * (V_i W(0) + sum_j V_j W_ij) for fluid particles
    (base_solver.py:521-541)."""
    def kern(cx):
        _, d2, mask = cx.geometry()
        return {"s": cx.sum(cx.slab("rest_volume") * _w_d2(d2, params), mask)}

    s = pair_exec.run(kern, env, {"rest_volume": sl["rest_volume"]},
                      {"pos": p.pos}, params)["s"]
    dens = (p.rest_volume * kernels.W0(params.support_radius, params.dim,
                                       params.kernel_type) + s) * params.density0
    return jnp.where(p.material == MATERIAL_FLUID, dens, p.density)


# ---------------------------------------------------------------------------
# Non-pressure accelerations
# ---------------------------------------------------------------------------

def gravity_acceleration(p: ParticleState, params: SimParams) -> jnp.ndarray:
    """Assign (not add) g to fluid particles (base_solver.py:202-207)."""
    g = jnp.asarray(params.gravity, jnp.float32)
    fluid = (p.material == MATERIAL_FLUID)[:, None]
    return jnp.where(fluid, g[None, :], 0.0)


def surface_tension_acceleration(p: ParticleState, env: PairEnv, sl: dict,
                                 params: SimParams) -> jnp.ndarray:
    """Cohesion-style surface tension over fluid neighbors
    (base_solver.py:209-229)."""
    diam = params.particle_diameter

    def kern(cx):
        R, d2, mask = cx.geometry()
        # W(diameter) is a compile-time constant; built inside the kernel so
        # the Pallas trace doesn't close over a traced scalar
        w_d = kernels.W(jnp.float32(diam), params.support_radius,
                        params.dim, params.kernel_type)
        W = cx.where(d2 > diam * diam, _w_d2(d2, params), w_d)
        valid = mask & (cx.slab("material") == MATERIAL_FLUID)
        mW = cx.slab("mass") * W
        return {f"s{d}": cx.sum(mW * R[d], valid) for d in range(params.dim)}

    out = pair_exec.run(kern, env,
                        {"material": sl["material"], "mass": sl["mass"]},
                        {"pos": p.pos}, params)
    a = -params.surface_tension / jnp.maximum(p.mass, 1e-12)[:, None] * out["s"]
    return jnp.where((p.material == MATERIAL_FLUID)[:, None], a, 0.0)


def viscosity_acceleration_standard(
    p: ParticleState, vel: jnp.ndarray, rigid: RigidState,
    env: PairEnv, sl: dict, params: SimParams,
    vel_slab: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """XSPH-style viscosity (base_solver.py:231-278). Returns
    (acceleration, rigid_force, rigid_torque). ``vel``/``vel_slab`` are
    passed separately so the implicit solver can evaluate the operator at the
    CG solution (base_solver.py:515)."""
    d2c = 2.0 * (params.dim + 2)
    if vel_slab is None:
        vel_slab = sl["vel"]
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        gw = _gw_coef(d2, params)
        vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
        v_xy = sum((vb[d] - vs[d]) * R[d] for d in range(dim))
        denom = d2 + 0.01 * params.support_radius ** 2
        mat_j = cx.slab("material")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        rho_j = cx.slab("density")
        rho_j = cx.where(rho_j > 0, rho_j, 1.0)
        m_ij = 0.5 * (cx.blk("mass") + cx.slab("mass"))
        coef_f = d2c * params.viscosity * m_ij / rho_j / denom * v_xy
        m_b = params.density0 * cx.slab("rest_volume")
        coef_b = d2c * params.viscosity_b * m_b / cx.blk("rho_i_safe") / denom * v_xy
        coef = (cx.where(fluid_j, coef_f, 0.0) +
                cx.where(rigid_j, coef_b, 0.0)) * gw
        out = {f"acc{d}": cx.sum(coef * R[d], mask) for d in range(dim)}

        if params.has_dynamic_rigid:
            # wrench accumulated on the RIGID row r (pair symmetry;
            # base_solver.py:272-278)
            pair_ok = mask & (mat_j == MATERIAL_FLUID) & \
                (cx.blk("rigid_dyn") > 0)
            c = d2c * params.viscosity_b * cx.blk("rest_volume") * \
                cx.slab("mass") / rho_j / denom * v_xy * gw
            c = cx.where(pair_ok, c, 0.0)
            for d in range(dim):
                out[f"fpp{d}"] = cx.sum(c * R[d], pair_ok)
        return out

    rho_i_safe = jnp.where(p.density > 0, p.density, 1.0)
    fields = {"pos": p.pos, "vel": vel, "mass": p.mass,
              "rest_volume": p.rest_volume, "rho_i_safe": rho_i_safe}
    if params.has_dynamic_rigid:
        fields["rigid_dyn"] = (
            (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
        ).astype(jnp.int32)
    out = pair_exec.run(
        kern, env,
        {"vel": vel_slab, "material": sl["material"], "density": sl["density"],
         "mass": sl["mass"], "rest_volume": sl["rest_volume"]},
        fields, params)
    fluid_i = p.material == MATERIAL_FLUID
    a = jnp.where(fluid_i[:, None], out["acc"] / params.density0, 0.0)
    if not params.has_dynamic_rigid:
        return a, jnp.zeros_like(rigid.force), jnp.zeros_like(rigid.torque)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    com_i = object_gather({"com": rigid.com}, obj, params.max_objects)["com"]
    arm = p.pos - com_i
    torque_pp = pair_cross(arm, out["fpp"], params.dim)
    force, torque = reduce_wrench(out["fpp"], torque_pp, p, params)
    return a, force, torque


def _nonpressure_outputs(cx, params: SimParams) -> dict:
    """Kernel-body fragment: surface tension sums ``st{d}``, viscosity sums
    ``acc{d}`` and (dynamic rigids) viscosity wrench sums ``fpp{d}``.
    Factored out so other passes (e.g. the DFSPH warm-start correction) can
    ride the same kernel (slab/block names: vel, material, mass, rest_volume,
    inv_rho, rigid_dyn)."""
    d2c = 2.0 * (params.dim + 2)
    diam = params.particle_diameter
    dim = params.dim
    R, d2, mask = cx.geometry()
    gw = _gw_coef(d2, params)
    mat_j = cx.slab("material")
    fluid_j = mask & (mat_j == MATERIAL_FLUID)
    rigid_j = mask & (mat_j == MATERIAL_RIGID)

    # surface tension (fluid neighbors only; base_solver.py:209-229)
    w_dm = kernels.W(jnp.float32(diam), params.support_radius,
                     params.dim, params.kernel_type)
    Wst = cx.where(d2 > diam * diam, _w_d2(d2, params), w_dm)
    mW = cx.slab("mass") * Wst
    out = {f"st{d}": cx.sum(cx.where(fluid_j, mW * R[d], 0.0), fluid_j)
           for d in range(dim)}

    # standard viscosity (base_solver.py:231-278)
    vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
    v_xy = sum((vb[d] - vs[d]) * R[d] for d in range(dim))
    denom = d2 + 0.01 * params.support_radius ** 2
    inv_denom = 1.0 / denom
    inv_rho_j = cx.slab("inv_rho")          # hoisted per-particle 1/rho
    m_ij = 0.5 * (cx.blk("mass") + cx.slab("mass"))
    coef_f = d2c * params.viscosity * m_ij * inv_rho_j * inv_denom * v_xy
    m_b = params.density0 * cx.slab("rest_volume")
    coef_b = d2c * params.viscosity_b * m_b * cx.blk("inv_rho") * \
        inv_denom * v_xy
    coef = (cx.where(fluid_j, coef_f, 0.0) +
            cx.where(rigid_j, coef_b, 0.0)) * gw
    for d in range(dim):
        out[f"acc{d}"] = cx.sum(coef * R[d], mask)

    if params.has_dynamic_rigid:
        # viscosity wrench on the rigid row (base_solver.py:272-278)
        pair_ok = mask & (mat_j == MATERIAL_FLUID) & \
            (cx.blk("rigid_dyn") > 0)
        c = d2c * params.viscosity_b * cx.blk("rest_volume") * \
            cx.slab("mass") * inv_rho_j * inv_denom * v_xy * gw
        c = cx.where(pair_ok, c, 0.0)
        for d in range(dim):
            out[f"fpp{d}"] = cx.sum(c * R[d], pair_ok)
    return out


def _nonpressure_reduce(out, p: ParticleState, rigid: RigidState,
                        params: SimParams):
    """Post-process _nonpressure_outputs into (acceleration, rigid force,
    rigid torque)."""
    fluid_i = (p.material == MATERIAL_FLUID)[:, None]
    a_st = -params.surface_tension / jnp.maximum(p.mass, 1e-12)[:, None] * out["st"]
    a = jnp.where(fluid_i, a_st + out["acc"] / params.density0, 0.0)
    if not params.has_dynamic_rigid:
        return a, jnp.zeros_like(rigid.force), jnp.zeros_like(rigid.torque)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    com_i = object_gather({"com": rigid.com}, obj, params.max_objects)["com"]
    arm = p.pos - com_i
    torque_pp = pair_cross(arm, out["fpp"], params.dim)
    force, torque = reduce_wrench(out["fpp"], torque_pp, p, params)
    return a, force, torque


def nonpressure_fused(
    p: ParticleState, rigid: RigidState, env: PairEnv, sl: dict,
    params: SimParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Surface tension + standard viscosity (+ viscosity rigid wrench) in a
    single pair pass — physics identical to calling the two ops separately."""
    def kern(cx):
        return _nonpressure_outputs(cx, params)

    inv_rho = 1.0 / jnp.where(p.density > 0, p.density, 1.0)
    inv_rho_slab = jax.tree.map(
        lambda rho: 1.0 / jnp.where(rho > 0, rho, 1.0), sl["density"])
    fields = {"pos": p.pos, "vel": p.vel, "mass": p.mass,
              "rest_volume": p.rest_volume, "inv_rho": inv_rho}
    if params.has_dynamic_rigid:
        fields["rigid_dyn"] = (
            (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
        ).astype(jnp.int32)
    out = pair_exec.run(
        kern, env,
        {"vel": sl["vel"], "material": sl["material"],
         "mass": sl["mass"], "rest_volume": sl["rest_volume"],
         "inv_rho": inv_rho_slab},
        fields, params)
    return _nonpressure_reduce(out, p, rigid, params)


# ---------------------------------------------------------------------------
# Pressure acceleration (symmetric form) + Akinci coupling
# ---------------------------------------------------------------------------

def pressure_acceleration(
    p: ParticleState, rigid: RigidState, env: PairEnv, sl: dict,
    params: SimParams,
    pressure: jnp.ndarray | None = None,
    pressure_slab: jnp.ndarray | None = None,
    with_wrench: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """a_i = -sum_j m_j (p_i/rho_i^2 + p_j/rho_j^2) gradW (fluid j), mirrored
    rigid term with rho0, plus fluid->rigid wrench (base_solver.py:135-187).
    ``with_wrench=False`` gives PCISPH's temp acceleration (PCISPH.py:74-107).
    """
    if pressure is None:
        pressure = p.pressure
    if pressure_slab is None:
        pressure_slab = sl["pressure"]
    dim = params.dim
    O = params.max_objects
    p_rho2 = pressure / jnp.maximum(p.density * p.density, 1e-12)
    # hoist p/rho^2 to slab level: one elementwise op on the (NB, 9S) slabs
    # instead of a division per (block x window) pair (~B=256x more work)
    p_rho2_slab = jax.tree.map(
        lambda pr, rho: pr / jnp.maximum(rho * rho, 1e-12),
        pressure_slab, sl["density"])

    def kern(cx):
        # p/rho^2 is slabbed per particle — no per-pair divisions
        R, d2, mask = cx.geometry()
        gw = _gw_coef(d2, params)
        mat_j = cx.slab("material")
        fluid_j = mask & (mat_j == MATERIAL_FLUID)
        rigid_j = mask & (mat_j == MATERIAL_RIGID)
        p_rho2_i = cx.blk("p_rho2")
        term_f = cx.slab("mass") * (p_rho2_i + cx.slab("p_rho2"))
        term_b = params.density0 * cx.slab("rest_volume") * p_rho2_i
        term = (cx.where(fluid_j, term_f, 0.0) +
                cx.where(rigid_j, term_b, 0.0)) * gw
        out = {f"acc{d}": cx.sum(-term * R[d], mask) for d in range(dim)}

        if with_wrench:
            # wrench on rigid row r from fluid i (base_solver.py:178-185):
            # arm uses the FLUID position x_i = x_r - R
            pair_ok = mask & (mat_j == MATERIAL_FLUID) & (cx.blk("rigid_dyn") > 0)
            m_n = params.density0 * cx.slab("rest_volume")
            c = -(params.density0 * cx.blk("rest_volume")) * \
                cx.slab("p_rho2") * m_n * gw
            f = [cx.where(pair_ok, c * R[d], 0.0) for d in range(dim)]
            arm = [cx.blk(f"pos{d}") - R[d] - cx.blk(f"com{d}")
                   for d in range(dim)]
            tq = cx.cross(arm, f)
            for d in range(dim):
                out[f"fpp{d}"] = cx.sum(f[d], pair_ok)
            for d in range(len(tq)):
                out[f"tpp{d}"] = cx.sum(tq[d], pair_ok)
        return out

    fields = {"pos": p.pos, "p_rho2": p_rho2, "rest_volume": p.rest_volume}
    if with_wrench:
        obj = jnp.clip(p.object_id, 0, O - 1)
        fields["com"] = object_gather({"com": rigid.com}, obj, O)["com"]
        fields["rigid_dyn"] = (
            (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0)
        ).astype(jnp.int32)
    out = pair_exec.run(
        kern, env,
        {"material": sl["material"],
         "mass": sl["mass"], "rest_volume": sl["rest_volume"],
         "p_rho2": p_rho2_slab},
        fields, params)
    fluid_i = p.material == MATERIAL_FLUID
    a = jnp.where((fluid_i & (p.is_dynamic > 0))[:, None], out["acc"], 0.0)
    if not with_wrench:
        return a, jnp.zeros_like(rigid.force), jnp.zeros_like(rigid.torque)
    tpp = out["tpp"] if out["tpp"].ndim == 2 else out["tpp"][:, None]
    force, torque = reduce_wrench(out["fpp"], tpp, p, params)
    return a, force, torque


# ---------------------------------------------------------------------------
# Integration, boundary, emitter (unchanged: purely per-particle)
# ---------------------------------------------------------------------------

def update_fluid_velocity(p: ParticleState, params: SimParams) -> ParticleState:
    fluid = (p.material == MATERIAL_FLUID)[:, None]
    return p.replace(vel=jnp.where(fluid, p.vel + params.dt * p.acc, p.vel))


def update_fluid_position(p: ParticleState, rigid: RigidState,
                          params: SimParams) -> ParticleState:
    """Advance fluid positions; emitter particles (non-fluid slots of a fluid
    object above g_upper) advect at constant velocity and flip to fluid when
    they sink below g_upper (base_solver.py:651-666).

    Fluid velocities above the CFL cap (params.vel_cap_cfl diameters/step)
    are rescaled first and stored — see params.py for the measured runaway
    rationale; diagnostics count particles at the cap (vel_capped)."""
    fluid = p.material == MATERIAL_FLUID
    vel = p.vel
    if params.vel_cap_cfl > 0:
        cap = jnp.float32(
            params.vel_cap_cfl * params.particle_diameter / params.dt)
        sp2 = jnp.sum(vel * vel, axis=-1, keepdims=True)
        scale = jnp.where(sp2 > cap * cap,
                          cap / jnp.sqrt(jnp.maximum(sp2, 1e-30)), 1.0)
        vel = jnp.where(fluid[:, None], vel * scale, vel)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    obj_mat = object_gather({"m": rigid.obj_material}, obj,
                            params.max_objects)["m"]
    obj_is_fluid = (obj_mat == MATERIAL_FLUID) & (p.object_id >= 0)
    emitter = (~fluid) & (p.pos[:, 1] > params.g_upper) & obj_is_fluid

    move = (fluid | emitter)[:, None]
    new_pos = jnp.where(move, p.pos + params.dt * vel, p.pos)
    became_fluid = emitter & (new_pos[:, 1] <= params.g_upper)
    new_mat = jnp.where(became_fluid, MATERIAL_FLUID, p.material)
    return p.replace(pos=new_pos, vel=vel, material=new_mat)


def prepare_emitter(p: ParticleState, params: SimParams) -> ParticleState:
    """Fluid particles above g_upper become rigid placeholders
    (base_solver.py:669-677)."""
    flip = (p.material == MATERIAL_FLUID) & (p.pos[:, 1] > params.g_upper)
    return p.replace(material=jnp.where(flip, MATERIAL_RIGID, p.material))


def enforce_domain_boundary(p: ParticleState, params: SimParams,
                            material: int = MATERIAL_FLUID) -> ParticleState:
    """Clamp particles of `material` into the padded domain and reflect the
    normal velocity with restitution loss c_f = 0.5 (base_solver.py:543-611)."""
    lo = jnp.asarray(params.domain_start, jnp.float32) + params.padding
    hi = jnp.asarray(params.domain_end, jnp.float32) - params.padding
    sel = (p.material == material) & (p.is_dynamic > 0)

    over = p.pos > hi
    under = p.pos <= lo
    normal = over.astype(jnp.float32) - under.astype(jnp.float32)
    new_pos = jnp.clip(p.pos, lo, hi)

    nlen = jnp.linalg.norm(normal, axis=-1)
    hit = sel & (nlen > 1e-6)
    n_unit = normal / jnp.maximum(nlen, 1e-12)[:, None]
    c_f = 0.5
    v_dot_n = jnp.sum(p.vel * n_unit, axis=-1)
    new_vel = p.vel - (1.0 + c_f) * v_dot_n[:, None] * n_unit

    pos = jnp.where(sel[:, None], new_pos, p.pos)
    vel = jnp.where(hit[:, None], new_vel, p.vel)
    return p.replace(pos=pos, vel=vel)


def renew_rigid_particle_state(p: ParticleState, rigid: RigidState,
                               params: SimParams) -> ParticleState:
    """x = com + R q, v = v_body + omega x (R q) for dynamic rigid particles
    (base_solver.py:615-629)."""
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    # one packed one-hot read for every body table (object_gather: the
    # row-gather form of this measured ~88 ms/step at 1M particles)
    t = object_gather(
        {"com0": rigid.com0, "com": rigid.com, "rot": rigid.rot,
         "omega": rigid.omega, "vel": rigid.vel,
         "dyn": rigid.is_dynamic}, obj, params.max_objects)
    sel = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0) & \
        (t["dyn"] > 0) & (p.object_id >= 0)
    q = p.rigid_rest_pos - t["com0"]
    rotq = jnp.einsum("nij,nj->ni", t["rot"], q)
    new_pos = t["com"] + rotq
    if params.dim == 3:
        spin = jnp.cross(t["omega"], rotq)
    else:
        w = t["omega"][:, 0]
        spin = jnp.stack([-w * rotq[:, 1], w * rotq[:, 0]], axis=-1)
    new_vel = t["vel"] + spin
    return p.replace(
        pos=jnp.where(sel[:, None], new_pos, p.pos),
        vel=jnp.where(sel[:, None], new_vel, p.vel),
    )
