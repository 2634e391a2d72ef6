"""Simulation state pytrees.

The reference keeps particle state in Taichi SoA fields
(``SPH/containers/base_container.py:137-190``). Here the state is a pytree of
fixed-shape ``jnp`` arrays so the whole step is one jitted function; dynamic
particle counts become an activity mask (``material == MATERIAL_NONE`` means
the slot is empty), matching the reference's preallocate-to-max design.
"""
from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import struct

from .params import MATERIAL_NONE, SimParams


class ParticleState(struct.PyTreeNode):
    """Per-particle SoA arrays, all shaped (n_pad, ...) and sorted by grid cell.

    Mirrors BaseContainer's fields (base_container.py:138-165) plus entry-time
    bookkeeping that replaces the host-side ``insert_object`` loop.
    """

    pos: jnp.ndarray            # (N, dim) f32
    vel: jnp.ndarray            # (N, dim) f32
    acc: jnp.ndarray            # (N, dim) f32
    rest_volume: jnp.ndarray    # (N,) f32   - Akinci pseudo-volume for rigid
    mass: jnp.ndarray           # (N,) f32
    density: jnp.ndarray        # (N,) f32
    pressure: jnp.ndarray       # (N,) f32
    material: jnp.ndarray       # (N,) i32   - 0 none / 1 fluid / 2 rigid
    object_id: jnp.ndarray      # (N,) i32   - -1 for padding
    is_dynamic: jnp.ndarray     # (N,) i32
    rigid_rest_pos: jnp.ndarray  # (N, dim) f32 - body-frame position at load
    # Deferred-entry support (reference: entryTime gating in insert_object).
    # A slot with material == MATERIAL_NONE and entry_material != NONE becomes
    # active once sim time reaches entry_time.
    entry_time: jnp.ndarray     # (N,) f32
    entry_material: jnp.ndarray  # (N,) i32

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]

    def active_mask(self) -> jnp.ndarray:
        return self.material != MATERIAL_NONE


class RigidState(struct.PyTreeNode):
    """Per-object rigid-body state (reference base_container.py:155-165).

    The reference delegates integration to PyBullet with identity inertia
    (utils/urdf.py:17); here the integrator is pure JAX (rigid/integrator.py)
    so the step never leaves the device.
    """

    mass: jnp.ndarray           # (O,) f32
    com: jnp.ndarray            # (O, dim) f32 - center of mass
    com0: jnp.ndarray           # (O, dim) f32 - original center of mass
    rot: jnp.ndarray            # (O, dim, dim) f32 - rotation matrix
    vel: jnp.ndarray            # (O, dim) f32
    omega: jnp.ndarray          # (O, dim) f32 (3D) / (O, 1) (2D angular rate)
    force: jnp.ndarray          # (O, dim) f32 - accumulated SPH force
    torque: jnp.ndarray         # (O, dim) or (O, 1) f32
    is_dynamic: jnp.ndarray     # (O,) i32
    obj_material: jnp.ndarray   # (O,) i32 - object material (fluid/rigid/none)
    entry_time: jnp.ndarray     # (O,) f32
    present: jnp.ndarray        # (O,) i32 - object has entered the scene


class SimState(struct.PyTreeNode):
    particles: ParticleState
    rigid: RigidState
    t: jnp.ndarray              # () f32 simulation time
    step_count: jnp.ndarray     # () i32
    # Warm-start velocity guess carried across steps by the implicit viscosity
    # CG solver (reference base_solver.py:290-293,439-443).
    visc_x: jnp.ndarray         # (N, dim) f32
    # DFSPH carries density/alpha/neighbors across the step boundary: the
    # reference computes them at the *end* of _step for use at the start of
    # the next (DFSPH.py:316-319).
    dfsph_alpha: jnp.ndarray    # (N,) f32
    # accumulated constant-density stiffness of the previous step's solve —
    # the dfsph_warm_start carry (zeros when warm start is off)
    dfsph_kappa: jnp.ndarray    # (N,) f32
    # accumulated divergence stiffness — the dfsph_warm_start_div carry
    dfsph_kappa_v: jnp.ndarray  # (N,) f32
    # overflow accumulators: total sort overflow since start (any nonzero =
    # corrupted records somewhere in the run) and max per-step window
    # truncation — carried in state so chunked diagnostic fetches can't
    # miss a corrupt intermediate step
    sort_overflow_acc: jnp.ndarray    # () i32
    window_overflow_max: jnp.ndarray  # () i32
    # IISPH's d_ii reads the previous step's advected density for rigid
    # neighbors (IISPH.py:39-44 runs before :212's recompute) — carried here.
    iisph_density_star: jnp.ndarray  # (N,) f32
    cached_neighbors: tp.Any = None  # ops.neighbors.Neighbors or None


def zeros_state(params: SimParams) -> SimState:
    n, d, o = params.n_pad, params.dim, params.max_objects
    f = jnp.float32
    i = jnp.int32
    particles = ParticleState(
        pos=jnp.zeros((n, d), f),
        vel=jnp.zeros((n, d), f),
        acc=jnp.zeros((n, d), f),
        rest_volume=jnp.full((n,), params.v0, f),
        mass=jnp.zeros((n,), f),
        density=jnp.zeros((n,), f),
        pressure=jnp.zeros((n,), f),
        material=jnp.zeros((n,), i),
        object_id=jnp.full((n,), -1, i),
        is_dynamic=jnp.zeros((n,), i),
        rigid_rest_pos=jnp.zeros((n, d), f),
        entry_time=jnp.full((n,), -1.0, f),
        entry_material=jnp.zeros((n,), i),
    )
    ang = d if d == 3 else 1
    rigid = RigidState(
        mass=jnp.zeros((o,), f),
        com=jnp.zeros((o, d), f),
        com0=jnp.zeros((o, d), f),
        rot=jnp.tile(jnp.eye(d, dtype=f), (o, 1, 1)),
        vel=jnp.zeros((o, d), f),
        omega=jnp.zeros((o, ang), f),
        force=jnp.zeros((o, d), f),
        torque=jnp.zeros((o, ang), f),
        is_dynamic=jnp.zeros((o,), i),
        obj_material=jnp.zeros((o,), i),
        entry_time=jnp.full((o,), -1.0, f),
        present=jnp.zeros((o,), i),
    )
    return SimState(
        particles=particles,
        rigid=rigid,
        t=jnp.zeros((), f),
        step_count=jnp.zeros((), i),
        visc_x=jnp.zeros((n, d), f),
        dfsph_alpha=jnp.zeros((n,), f),
        dfsph_kappa=jnp.zeros((n,), f),
        dfsph_kappa_v=jnp.zeros((n,), f),
        sort_overflow_acc=jnp.zeros((), i),
        window_overflow_max=jnp.zeros((), i),
        iisph_density_star=jnp.zeros((n,), f),
        cached_neighbors=None,
    )
