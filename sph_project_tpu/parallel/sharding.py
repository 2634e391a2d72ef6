"""Multi-chip execution: particle sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3); its only parallelism is
Taichi's intra-kernel thread mapping. The TPU-native scale-out axis is the
particle dimension: every (N, ...) array is sharded over a 1-D ``Mesh`` axis
``"p"`` and the step function is jitted with those shardings. XLA then inserts
the collectives — the cell-sorted global ``argsort`` becomes a distributed
sort, neighbor gathers become cross-shard gathers riding the ICI, and the
solver-loop error terms become ``psum``-style reductions.

This is the correctness-first decomposition (everything works, any scale);
the bandwidth-optimal spatial decomposition with halo exchange lives behind
the same API so it can swap in without touching solver code.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import SimParams
from ..core.state import SimState
from .. import sim as simlib

PARTICLE_AXIS = "p"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (PARTICLE_AXIS,))


def _state_sharding(state: SimState, mesh: Mesh, n_pad: int):
    """Shard every array whose leading dim is the particle capacity over the
    mesh; replicate rigid-body tables and scalars."""
    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == n_pad:
            return NamedSharding(mesh, P(PARTICLE_AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, state)


def shard_state(state: SimState, mesh: Mesh, params: SimParams) -> SimState:
    shardings = _state_sharding(state, mesh, params.n_pad)
    return jax.tree.map(jax.device_put, state, shardings)


def sharded_step_fn(params: SimParams, mesh: Mesh, template: SimState):
    """Jit the full step with particle shardings pinned on inputs & outputs."""
    step = simlib.get_step_fn(params)
    in_sh = _state_sharding(template, mesh, params.n_pad)
    return jax.jit(step, in_shardings=(in_sh,), out_shardings=None)


def sharded_prepare_fn(params: SimParams, mesh: Mesh, template: SimState):
    prep = functools.partial(simlib.prepare, params=params)
    in_sh = _state_sharding(template, mesh, params.n_pad)
    return jax.jit(prep, in_shardings=(in_sh,), out_shardings=None)
