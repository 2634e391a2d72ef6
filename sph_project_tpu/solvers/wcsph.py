"""WCSPH: weakly-compressible SPH with Tait EOS.

Physics matches the reference WCSPHSolver (SPH/fluid_solvers/WCSPH.py):
gamma = 7, stiffness = 50000 (hardcoded there, WCSPH.py:12-13 — scene keys
``stiffness``/``exponent`` are ignored by the reference and here), density
clamped to >= rho0 before the EOS (WCSPH.py:22), single feed-forward pass
(WCSPH.py:27-45).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.params import MATERIAL_FLUID, SimParams
from ..core.state import SimState
from ..ops.pairs import slab_pack
from . import common


def compute_pressure(p, params: SimParams):
    """Tait EOS; also writes back the clamped density (WCSPH.py:16-24)."""
    fluid = p.material == MATERIAL_FLUID
    rho = jnp.maximum(p.density, params.density0)
    pressure = params.wcsph_stiffness * (
        jnp.power(rho / params.density0, params.wcsph_gamma) - 1.0)
    return p.replace(
        density=jnp.where(fluid, rho, p.density),
        pressure=jnp.where(fluid, pressure, p.pressure),
    )


def step(state: SimState, params: SimParams, plumbing) -> tuple[SimState, dict]:
    """One WCSPH step (WCSPH.py:27-45 + base step wrapper base_solver.py:692-696)."""
    state, env = plumbing.neighbor_prep(state, params)
    p, rigid = state.particles, state.rigid
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)

    p = p.replace(density=common.compute_density(p, env, sl, params))
    sl["density"] = slab_pack(env, {"d": p.density})["d"]
    p, rigid = plumbing.non_pressure_acceleration(p, rigid, env, sl, state, params)
    p = common.update_fluid_velocity(p, params)

    p = compute_pressure(p, params)
    up = slab_pack(env, {"d": p.density, "pr": p.pressure})
    sl["density"], sl["pressure"] = up["d"], up["pr"]
    acc, rf, rt = common.pressure_acceleration(
        p, rigid, env, sl, params, with_wrench=params.has_dynamic_rigid)
    p = p.replace(acc=acc)
    rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)

    p = common.update_fluid_velocity(p, params)
    p = common.update_fluid_position(p, rigid, params)

    state = state.replace(particles=p, rigid=rigid)
    state = plumbing.rigid_and_tail(state, env, sl, params)
    diag = plumbing.diagnostics(state, env, params)
    return state, diag
