"""On-device rigid-body dynamics, replacing the reference's PyBullet backend.

The reference ships accumulated SPH forces/torques to a host-side Bullet world
each step (bullet_solver.py:144-167) — a device->host->Bullet->device round
trip per step. Here the integrator is pure JAX so the entire simulation step
stays compiled on the TPU.

Behavioral notes vs Bullet:
- The reference's URDF gives every body **unit inertia** (utils/urdf.py:17),
  so omega_dot = torque exactly; we reproduce that.
- Bullet's role beyond integration is collision: 6 static walls inset by
  ``eps = padding + diameter + box_thickness`` (bullet_solver.py:53-71) and
  rigid-rigid contact. Walls become a projection + velocity clamp on the
  body's particle extremes; rigid-rigid contact is a particle-pair penalty
  accumulated with the same neighbor lists the fluid uses
  (see :func:`rigid_contact_wrench`).
- Integration order matches Bullet's semi-implicit Euler:
  v += dt*(g + F/m); x += dt*v.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.params import MATERIAL_RIGID, SimParams
from ..core.state import ParticleState, RigidState


def _rodrigues(omega: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Rotation matrix for the incremental rotation omega*dt (batched, 3D)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt      # (O, 1)
    axis = omega / jnp.maximum(theta / dt, 1e-12)
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)                                                            # (O, 3, 3)
    th = theta[..., None]
    eye = jnp.eye(3, dtype=omega.dtype)[None]
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def rigid_contact_wrench(
    p: ParticleState, rigid: RigidState, env, params: SimParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Particle-pair penalty contact between *different* rigid bodies.

    A DEM-style spring + normal damping accumulated per body over the pair
    windows. Only the shape-matching backend still uses this (its particles
    integrate freely, so body-level impulses don't apply); the default
    integrator resolves contact with :func:`resolve_body_contacts`, which is
    stable at any stiffness.
    """
    from ..ops import pair_exec
    from ..solvers.common import pair_cross, reduce_wrench

    d0 = params.particle_diameter
    dim = params.dim

    def kern(cx):
        R, d2, mask = cx.geometry()
        dist = jnp.sqrt(d2)
        rigid_pair = (cx.blk("material") == MATERIAL_RIGID) & \
                     (cx.slab("material") == MATERIAL_RIGID) & \
                     (cx.blk("object_id") != cx.slab("object_id")) & mask
        pen = d0 - dist
        touching = rigid_pair & (pen > 0.0)
        inv_dist = 1.0 / jnp.maximum(dist, 1e-9)
        vb, vs = cx.vec_blk("vel"), cx.vec_slab("vel")
        vn = sum((vb[d] - vs[d]) * R[d] for d in range(dim)) * inv_dist
        fmag = params.contact_stiffness * pen - params.contact_damping * \
            params.contact_stiffness * params.dt * vn
        fmag = cx.where(touching, jnp.maximum(fmag, 0.0) * inv_dist, 0.0)
        # force acts on particle i's body; the reaction appears when the
        # pair shows up mirrored (windows are symmetric by construction)
        return {f"f{d}": cx.sum(fmag * R[d], touching) for d in range(dim)}

    force_pp = pair_exec.run(
        kern, env,
        {"material": p.material, "object_id": p.object_id, "vel": p.vel},
        {"pos": p.pos, "material": p.material, "object_id": p.object_id,
         "vel": p.vel}, params)["f"]
    from ..solvers.common import object_gather
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    com_i = object_gather({"com": rigid.com}, obj, params.max_objects)["com"]
    torque_pp = pair_cross(p.pos - com_i, force_pp, params.dim)
    return reduce_wrench(force_pp, torque_pp, p, params)


_CHAN_TAGS = "abcdefghijklmnopqrstuvwxyz"


def _chan_tags(params: SimParams):
    """Output-name tags: one per dynamic body channel + 'st' for the merged
    static channel (letters, so pair_exec's digit-suffix vector packing only
    fires on the trailing component index)."""
    n = len(params.contact_channels)
    assert n <= len(_CHAN_TAGS), f"{n} dynamic rigid bodies > channel tags"
    return [_CHAN_TAGS[i] for i in range(n)] + ["st"]


def rigid_contact_data(p: ParticleState, rigid: RigidState, env,
                       params: SimParams) -> dict:
    """Per-particle, per-BODY contact aggregates between rigid bodies.

    Every dynamic rigid body (``params.contact_channels``) gets its own exact
    output channel: for rigid particle i, the penetration-weighted sums over
    neighbors j belonging to THAT body within one particle diameter — total
    weight ``cw_<tag>`` and unit normal ``cn_<tag>`` (pointing toward i). A
    particle simultaneously touching bodies 1 and 3 therefore produces two
    separate records (the round-1/2 scheme averaged the neighbor ids — body
    2 — and misdirected pileup impulses). All static rigid geometry (domain
    box, static meshes) shares the merged ``st`` channel: static bodies are
    indistinguishable to the impulse solve (inverse mass 0). Emitter
    placeholders (fluid flipped rigid above g_upper, base_solver.py:17-23)
    are excluded via the true-body flag.
    """
    from ..ops import pair_exec

    d0 = params.particle_diameter
    dim = params.dim
    chans = params.contact_channels
    tags = _chan_tags(params)

    def kern(cx):
        R, d2, mask = cx.geometry()
        dist = jnp.sqrt(d2)
        sobj = cx.slab("object_id")
        touching = (cx.blk("material") == MATERIAL_RIGID) & \
                   (cx.slab("material") == MATERIAL_RIGID) & \
                   (cx.blk("object_id") != sobj) & mask & (dist < d0)
        pen = cx.where(touching, d0 - dist, 0.0)
        inv_dist = 1.0 / jnp.maximum(dist, 1e-9)
        sels = [touching & (sobj == float(oid)) for oid in chans]
        sels.append(touching & (cx.slab("static_body") > 0.0))
        out = {}
        for tag, sel in zip(tags, sels):
            out[f"cw_{tag}"] = cx.sum(pen, sel)
            for d in range(dim):
                out[f"cn_{tag}{d}"] = cx.sum(pen * R[d] * inv_dist, sel)
        return out

    from ..solvers.common import object_gather
    oid = p.object_id.astype(jnp.float32)
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    t = object_gather({"m": rigid.obj_material, "dyn": rigid.is_dynamic},
                      obj, params.max_objects)
    static_body = ((t["m"] == MATERIAL_RIGID) & (t["dyn"] == 0) &
                   (p.object_id >= 0)).astype(jnp.float32)
    return pair_exec.run(
        kern, env,
        {"material": p.material, "object_id": oid, "static_body": static_body},
        {"pos": p.pos, "material": p.material, "object_id": oid}, params)


def resolve_body_contacts(
    p: ParticleState, rigid: RigidState, vel: jnp.ndarray,
    omega: jnp.ndarray, contact: dict, params: SimParams,
):
    """Body-pair impulse contact with Coulomb friction (restitution 0 by
    default, like Bullet's), replacing the reference's `p.stepSimulation()`
    contact resolution (bullet_solver.py:158).

    Per-particle per-channel records from :func:`rigid_contact_data` are
    reduced by the particle's own EXACT body id into an (O, C) ordered-pair
    table — row a = body owning the particles, column c = the touched
    dynamic body (or the merged static channel) — so simultaneous multi-body
    pileups keep separate impulses. Each active pair gets
    ``params.contact_iters`` sequential-impulse sweeps at its weighted
    contact point (unit inertia, matching the reference's URDFs): a normal
    impulse against closing velocity plus Coulomb friction clamped by
    mu * (accumulated normal impulse), and one mass-split positional
    de-penetration. Dynamic-dynamic contacts appear twice ((a,b) and (b,a)),
    so impulses apply at half strength; dynamic-static contacts also appear
    twice (once from each side's particles, the static side inert).
    """
    O = params.max_objects
    dim = params.dim
    tags = _chan_tags(params)
    C = len(tags)
    obj = jnp.clip(p.object_id, 0, O - 1)

    from ..solvers.common import object_reduce
    packed = {}
    for tag in tags:
        w_c = contact[f"cw_{tag}"]                          # (N,)
        packed[f"w_{tag}"] = w_c
        packed[f"n_{tag}"] = contact[f"cn_{tag}"]           # (N, dim)
        packed[f"p_{tag}"] = w_c[:, None] * p.pos
        packed[f"c_{tag}"] = (w_c > 1e-12).astype(jnp.float32)
    # ONE one-hot MXU contraction for all 4*(C+1) per-object reductions
    # (the segment_sum form measured ~26 ms per (1M, 3) reduction on v5e)
    red = object_reduce(packed, obj, O)
    W = jnp.stack([red[f"w_{t}"] for t in tags], -1).reshape(O * C)
    N = jnp.stack([red[f"n_{t}"] for t in tags], 1).reshape(O * C, dim)
    Pt = jnp.stack([red[f"p_{t}"] for t in tags], 1).reshape(O * C, dim)
    cnt = jnp.stack([red[f"c_{t}"] for t in tags], -1).reshape(O * C)
    if params.spmd_axis:
        W, N, Pt, cnt = (jax.lax.psum(x, params.spmd_axis)
                         for x in (W, N, Pt, cnt))

    active = W > 1e-12
    Ws = jnp.maximum(W, 1e-12)
    n_len = jnp.linalg.norm(N, axis=-1)
    n_hat = N / jnp.maximum(n_len, 1e-12)[:, None]          # points toward a
    point = Pt / Ws[:, None]
    pen = Ws / jnp.maximum(cnt, 1.0)                        # mean penetration

    ia = jnp.arange(O * C, dtype=jnp.int32) // C
    # column -> touched body id; the static channel maps to a sentinel slot
    # whose inverse mass/inertia are forced to zero below
    chan_ids = list(params.contact_channels) + [0]
    ib = jnp.tile(jnp.asarray(chan_ids, jnp.int32), O)
    b_static = jnp.tile(jnp.asarray(
        [False] * len(params.contact_channels) + [True]), O)

    def body_dyn(i):
        return (rigid.is_dynamic[i] > 0) & (rigid.present[i] > 0) & \
               (rigid.obj_material[i] == MATERIAL_RIGID)

    inv_ma = jnp.where(body_dyn(ia) & (rigid.mass[ia] > 0),
                       1.0 / jnp.maximum(rigid.mass[ia], 1e-12), 0.0)
    inv_mb = jnp.where(body_dyn(ib) & (rigid.mass[ib] > 0) & ~b_static,
                       1.0 / jnp.maximum(rigid.mass[ib], 1e-12), 0.0)
    inv_Ia = jnp.where(body_dyn(ia), 1.0, 0.0)              # unit inertia
    inv_Ib = jnp.where(body_dyn(ib) & ~b_static, 1.0, 0.0)
    # drop self-pairs (a body's own particles never record against itself,
    # but a dynamic channel exists for every row) and static-static rows
    active = active & ~((ia == ib) & ~b_static)

    from ..solvers.common import pair_cross
    r_a = point - rigid.com[ia]
    r_b = point - rigid.com[ib]
    ra_x_n = pair_cross(r_a, n_hat, dim)
    rb_x_n = pair_cross(r_b, n_hat, dim)
    K = inv_ma + inv_mb + \
        jnp.sum(ra_x_n * ra_x_n, -1) * inv_Ia + \
        jnp.sum(rb_x_n * rb_x_n, -1) * inv_Ib
    ok = active & (K > 1e-12)
    e = params.contact_restitution
    mu = params.contact_friction

    def to_bodies(idx, vals, mask):
        vals = jnp.where(mask[:, None], vals, 0.0)
        return jnp.stack([
            jax.ops.segment_sum(vals[:, d], idx, num_segments=O)
            for d in range(vals.shape[1])], -1)

    def point_vel(v, om, idx, r):
        if dim == 3:
            return v[idx] + jnp.cross(om[idx], r)
        w_ = om[idx][:, 0]
        return v[idx] + jnp.stack([-w_ * r[:, 1], w_ * r[:, 0]], -1)

    jn_acc = jnp.zeros(O * C)
    for _ in range(max(params.contact_iters, 1)):
        va = point_vel(vel, omega, ia, r_a)
        vb = jnp.where(b_static[:, None], 0.0,
                       point_vel(vel, omega, ib, r_b))
        vrel = va - vb
        vn = jnp.sum(vrel * n_hat, axis=-1)                 # <0 = closing
        j = jnp.where(ok & (vn < 0.0),
                      -(1.0 + e) * vn / jnp.maximum(K, 1e-12), 0.0)
        j = 0.5 * j                                         # ordered-pair dup
        jn_acc = jn_acc + j

        # Coulomb friction against the tangential point velocity, clamped by
        # mu * accumulated normal impulse (so resting stacks keep traction)
        vt = vrel - vn[:, None] * n_hat
        vt_len = jnp.linalg.norm(vt, axis=-1)
        t_hat = vt / jnp.maximum(vt_len, 1e-9)[:, None]
        ra_x_t = pair_cross(r_a, t_hat, dim)
        rb_x_t = pair_cross(r_b, t_hat, dim)
        Kt = inv_ma + inv_mb + \
            jnp.sum(ra_x_t * ra_x_t, -1) * inv_Ia + \
            jnp.sum(rb_x_t * rb_x_t, -1) * inv_Ib
        jt = jnp.where(ok & (Kt > 1e-12),
                       0.5 * vt_len / jnp.maximum(Kt, 1e-12), 0.0)
        jt = jnp.minimum(jt, mu * jn_acc)

        imp = j[:, None] * n_hat - jt[:, None] * t_hat
        dwa = (inv_Ia[:, None]) * (pair_cross(r_a, imp, dim))
        dwb = (-inv_Ib[:, None]) * (pair_cross(r_b, imp, dim))
        vel = vel + to_bodies(ia, imp * inv_ma[:, None], ok) \
                  + to_bodies(ib, -imp * inv_mb[:, None], ok)
        omega = omega + to_bodies(ia, dwa, ok) + to_bodies(ib, dwb, ok)

    # positional de-penetration, mass-split, half per ordered pair
    inv_sum = jnp.maximum(inv_ma + inv_mb, 1e-12)
    push = jnp.where(ok, 0.5 * 0.5 * pen, 0.0)              # relax 0.5
    dca = (push * inv_ma / inv_sum)[:, None] * n_hat
    dcb = -(push * inv_mb / inv_sum)[:, None] * n_hat
    d_com = to_bodies(ia, dca, ok) + to_bodies(ib, dcb, ok)
    return vel, omega, d_com


def rigid_body_step(
    p: ParticleState, rigid: RigidState, params: SimParams,
    contact: dict | None = None,
) -> RigidState:
    """Integrate dynamic rigid bodies one dt and resolve contact.

    Consumes (and zeroes) the accumulated SPH force/torque, mirroring
    bullet_solver.py:144-167 + p.stepSimulation(). Order matches Bullet's
    semi-implicit Euler: forces -> velocities -> contact impulses ->
    positions -> walls.
    """
    dt = params.dt
    g = jnp.asarray(params.gravity, jnp.float32)
    dyn = (rigid.is_dynamic > 0) & (rigid.present > 0) & \
          (rigid.obj_material == MATERIAL_RIGID)

    inv_m = jnp.where(rigid.mass > 0, 1.0 / jnp.maximum(rigid.mass, 1e-12), 0.0)
    vel = rigid.vel + dt * (g[None] + rigid.force * inv_m[:, None])
    # unit inertia (URDF ixx=iyy=izz=1): omega_dot = torque
    omega = rigid.omega + dt * rigid.torque
    d_com = 0.0
    if contact is not None:
        vel, omega, d_com = resolve_body_contacts(
            p, rigid, vel, omega, contact, params)
    com = rigid.com + dt * vel + d_com
    if params.dim == 3:
        rot = _rodrigues(omega, dt) @ rigid.rot
    else:
        th = omega[:, 0] * dt
        c, s = jnp.cos(th), jnp.sin(th)
        drot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
        rot = drot @ rigid.rot

    # ---- wall contact ------------------------------------------------------
    # Bullet walls are inset by eps from the domain (bullet_solver.py:57-61).
    eps = params.padding + params.particle_diameter + params.wall_thickness
    lo = jnp.asarray(params.domain_start, jnp.float32) + eps
    hi = jnp.asarray(params.domain_end, jnp.float32) - eps

    # per-body particle extent along each axis, via segment min/max of the
    # body's particles in their *new* pose x = com + R q
    O = params.max_objects
    from ..solvers.common import object_gather
    obj = jnp.clip(p.object_id, 0, O - 1)
    is_body = (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0) & (p.object_id >= 0)
    t = object_gather({"com0": rigid.com0, "com": com, "rot": rot}, obj, O)
    q = p.rigid_rest_pos - t["com0"]
    x_new = t["com"] + jnp.einsum("nij,nj->ni", t["rot"], q)
    seg = jnp.where(is_body, obj, O)
    big = jnp.float32(1e9)
    x_masked_min = jnp.where(is_body[:, None], x_new, big)
    x_masked_max = jnp.where(is_body[:, None], x_new, -big)
    bmin = jax.ops.segment_min(x_masked_min, seg, num_segments=O + 1)[:O]
    bmax = jax.ops.segment_max(x_masked_max, seg, num_segments=O + 1)[:O]
    if params.spmd_axis:
        bmin = jax.lax.pmin(bmin, params.spmd_axis)
        bmax = jax.lax.pmax(bmax, params.spmd_axis)

    pen_lo = jnp.maximum(lo[None] - bmin, 0.0)      # (O, dim)
    pen_hi = jnp.maximum(bmax - hi[None], 0.0)
    has_particles = bmin[:, 0] < big
    correction = jnp.where((dyn & has_particles)[:, None], pen_lo - pen_hi, 0.0)
    com = com + correction

    # kill inward normal velocity on contact (restitution 0, like Bullet's
    # default) and damp tangential/angular motion for stable stacking
    contact_lo = (pen_lo > 0.0)
    contact_hi = (pen_hi > 0.0)
    vel = jnp.where(contact_lo, jnp.maximum(vel, 0.0), vel)
    vel = jnp.where(contact_hi, jnp.minimum(vel, 0.0), vel)
    any_contact = jnp.any(contact_lo | contact_hi, axis=-1)
    damp = jnp.where(any_contact, 1.0 - params.wall_friction, 1.0)
    vel = vel * damp[:, None]
    omega = omega * damp[:, None] if params.dim == 3 else omega * damp[:, None]

    zeros_f = jnp.zeros_like(rigid.force)
    zeros_t = jnp.zeros_like(rigid.torque)
    keep = lambda new, old: jnp.where(dyn[:, None], new, old)
    return rigid.replace(
        com=keep(com, rigid.com),
        vel=keep(vel, rigid.vel),
        omega=keep(omega, rigid.omega),
        rot=jnp.where(dyn[:, None, None], rot, rigid.rot),
        force=zeros_f, torque=zeros_t,
    )
