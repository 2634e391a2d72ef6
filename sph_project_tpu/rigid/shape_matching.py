"""Shape-matching rigid solver (Mueller et al. 2005) — pure JAX.

Counterpart of the reference's ShapeMatchingRigidSolver
(SPH/rigid_solver/shape_matching_solver.py — present upstream but unused,
"not used in the project", shape_matching_solver.py:5). Provided as an
alternative rigid backend that needs no explicit inertia handling: particles
integrate freely, then each body's particle cloud is projected back onto the
best-fit rigid transform via polar decomposition.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState


def _polar_rotation(A: jnp.ndarray) -> jnp.ndarray:
    """Rotation factor of the polar decomposition A = R S (batched), via SVD
    with reflection fix (the reference uses ti.polar_decompose,
    shape_matching_solver.py:88)."""
    U, _, Vt = jnp.linalg.svd(A)
    R = U @ Vt
    det = jnp.linalg.det(R)
    # flip the last column of U where det(R) < 0 (reflection -> rotation)
    fix = jnp.concatenate(
        [jnp.ones(det.shape + (R.shape[-1] - 1,)), det[..., None]], axis=-1)
    return (U * fix[..., None, :]) @ Vt


def shape_matching_step(
    p: ParticleState, rigid: RigidState, params: SimParams,
) -> Tuple[ParticleState, RigidState]:
    """One projection: integrate rigid particles freely (gravity + the
    accumulated per-body SPH wrench spread over the body's particles), clamp
    them to the domain walls, fit the best rigid transform per body, snap
    particles onto it (shape_matching_solver.py:39-98). Selected per scene
    via ``"rigidSolver": "shape_matching"``; consumes and zeroes the rigid
    force/torque accumulators like the default integrator."""
    O = params.max_objects
    dt = params.dt
    g = jnp.asarray(params.gravity, jnp.float32)

    from ..solvers.common import object_gather, object_reduce
    sel = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0) & (p.object_id >= 0)
    obj = jnp.clip(p.object_id, 0, O - 1)

    # free integration: gravity + body force at COM + (unit-inertia) torque
    # as a spin contribution at each particle's arm (body tables read via
    # one one-hot contraction — row gathers run at scalar rate on TPU)
    inv_m = jnp.where(rigid.mass > 0, 1.0 / jnp.maximum(rigid.mass, 1e-12), 0.0)
    tb = object_gather({"f": rigid.force * inv_m[:, None], "com": rigid.com,
                        "tq": rigid.torque}, obj, O)
    acc = g[None] + tb["f"]
    arm = p.pos - tb["com"]
    if params.dim == 3:
        spin = jnp.cross(tb["tq"], arm)
    else:
        w = tb["tq"][:, 0]
        spin = jnp.stack([-w * arm[:, 1], w * arm[:, 0]], axis=-1)
    vel = jnp.where(sel[:, None], p.vel + dt * (acc + spin), p.vel)
    pos = jnp.where(sel[:, None], p.pos + dt * vel, p.pos)

    # wall clamp before the projection: the fitted transform then carries the
    # contact response (same inset as the integrator's Bullet-style walls)
    eps = params.padding + params.particle_diameter + params.wall_thickness
    lo = jnp.asarray(params.domain_start, jnp.float32) + eps
    hi = jnp.asarray(params.domain_end, jnp.float32) - eps
    clamped = jnp.clip(pos, lo, hi)
    hit = (clamped != pos) & sel[:, None]
    vel = jnp.where(hit, 0.0, vel)
    pos = jnp.where(sel[:, None], clamped, pos)

    # per-body counts and centroids
    def gsum(x):
        return jax.lax.psum(x, params.spmd_axis) if params.spmd_axis else x

    red = object_reduce(
        {"w": sel.astype(jnp.float32), "pos": pos,
         "rest": p.rigid_rest_pos}, obj, O, sel=sel)
    cnt = gsum(red["w"])
    cnt_safe = jnp.maximum(cnt, 1.0)
    com = gsum(red["pos"]) / cnt_safe[:, None]
    com0 = gsum(red["rest"]) / cnt_safe[:, None]

    # covariance A = sum (x - com)(q - com0)^T per body
    tc = object_gather({"com": com, "com0": com0}, obj, O)
    q = p.rigid_rest_pos - tc["com0"]
    x = pos - tc["com"]
    xq = (x[:, :, None] * q[:, None, :]).reshape(x.shape[0], -1)
    A = gsum(object_reduce({"a": xq}, obj, O, sel=sel)["a"]).reshape(
        O, params.dim, params.dim)
    has = cnt > 0
    eye = jnp.eye(params.dim, dtype=jnp.float32)[None]
    A = jnp.where(has[:, None, None], A, eye)
    R = _polar_rotation(A)

    # project particles onto the fitted transform; velocity from the motion
    goal = tc["com"] + jnp.einsum(
        "nij,nj->ni", object_gather({"r": R}, obj, O)["r"], q)
    new_vel = (goal - p.pos) / dt
    # restitution-0 walls: kill the contact-axis velocity of contacting bodies
    # (the clamp+projection alone would make bounces elastic) and damp the
    # rest by wall_friction, matching the integrator backend's behavior
    seg = jnp.where(sel, obj, O)
    hit_axis = jnp.stack([
        jax.ops.segment_max(jnp.where(sel, hit[:, d].astype(jnp.int32), 0),
                            seg, num_segments=O + 1)[:O]
        for d in range(params.dim)], axis=-1)                   # (O, dim)
    if params.spmd_axis:
        hit_axis = jax.lax.pmax(hit_axis, params.spmd_axis)
    body_hit = jnp.any(hit_axis > 0, axis=-1)
    th = object_gather(
        {"hx": hit_axis, "bh": body_hit.astype(jnp.int32)}, obj, O)
    new_vel = jnp.where(th["hx"] > 0, 0.0, new_vel)
    new_vel = new_vel * jnp.where(th["bh"] > 0, 1.0 - params.wall_friction,
                                  1.0)[:, None]
    p = p.replace(
        pos=jnp.where(sel[:, None], goal, p.pos),
        vel=jnp.where(sel[:, None], new_vel, p.vel),
    )
    active = has & (rigid.is_dynamic > 0)
    body_vel = (com - rigid.com) / dt
    rigid = rigid.replace(
        com=jnp.where(active[:, None], com, rigid.com),
        com0=jnp.where(active[:, None], com0, rigid.com0),
        rot=jnp.where(active[:, None, None], R, rigid.rot),
        vel=jnp.where(active[:, None], body_vel, rigid.vel),
        force=jnp.zeros_like(rigid.force),
        torque=jnp.zeros_like(rigid.torque),
    )
    return p, rigid
