"""Spatial domain decomposition over a device mesh (halo exchange + psum).

The state is kept globally cell-sorted (x-major), so an equal split of the
particle axis over devices IS a spatial slab decomposition of the domain.
Each step:

1. a global resort (plain jit over the sharded arrays — XLA's distributed
   sort/gather is the particle-migration mechanism, run once per step,
   twice for DFSPH which re-sorts mid-step);
2. the physics — every pair pass, solver loop, and rigid update — runs inside
   ``shard_map``: each device extends its slab with ``H`` halo particles from
   its neighbors via ``ppermute`` (boundary-cell exchange over ICI), builds a
   local window env on the extended arrays, and computes its own rows; solver
   residuals / CG dots / rigid wrenches cross shards as ``psum``
   (common.global_sum & friends).

Halo fields refresh on every pair pass, so solver iterations see current
neighbor velocities. Not-received halo slots (domain ends) get cell id -1 /
num_cells sentinels that keep the extended array cell-ascending (the env
builders shift their position tables past leading invalids).

This is the scale-out axis SURVEY.md §2.3 prescribes; the reference is
strictly single-GPU. The particle-axis ("naive") sharding in
parallel/sharding.py remains as an A/B fallback.
"""
from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import MATERIAL_FLUID, MATERIAL_NONE, MATERIAL_RIGID, SimParams
from ..core.state import SimState
from ..ops import neighbors as nblib
from .. import sim as simlib

AXIS = "x"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def halo_width(params: SimParams, n_local: int) -> int:
    """Halo size in particles: must contain every neighbor-shard particle
    within one support radius of the slab face. The state is x-major
    cell-sorted, so that set is exactly the neighbor's boundary x-cell-plane
    (the pair stencil reaches ±1 plane): H = the scene's max per-plane
    population (measured at seeding, params.halo_plane_max) x1.5 margin for
    densification, rounded to the engine block so the extended array stays
    block-aligned, capped at one full neighbor shard (single-hop exchange).
    Coverage is verified at runtime every step — shortfalls are counted into
    the overflow diagnostic (see neighbor_prep), never silent."""
    if params.resolved_pair_backend() == "pallas_dma":
        from ..ops import pair_dma
        budget = params.pair_dma_su
        m = pair_dma.B * params.pair_dma_group
    else:
        budget = max(params.pair_slab, params.pair_slab_big)
        m = params.pair_block
    h = int(params.halo_plane_max * 1.5) if params.halo_plane_max > 0 \
        else budget
    h = min(((h + m - 1) // m) * m, n_local // m * m)
    return max(h, m)


class SpatialEnv(struct.PyTreeNode):
    """Wraps an engine env built over the halo-extended local arrays."""

    inner: tp.Any
    halo: int = struct.field(pytree_node=False, default=0)
    # particles a neighbor shard needed but the halo did not contain
    # (runtime coverage check in neighbor_prep); folded into the overflow
    # diagnostic so cross-shard physics can never degrade silently
    halo_shortfall: tp.Any = 0

    @property
    def overflow(self):
        return self.inner.overflow + self.halo_shortfall

    @property
    def sort_overflow(self):
        return self.inner.sort_overflow

    @property
    def contact_env(self):
        """Spatial wrapper over the inner engine's rigid-contact-producer env
        (sim.build_env contact_produces): the contact pass's many output
        channels must not scan fluid superblocks under spmd either — the
        single-chip 706 ms/step failure mode (ROADMAP r4 A-C). Same halo (the
        layout is shared), shortfall accounted once by the main env."""
        inner_c = getattr(self.inner, "contact_env", None)
        if inner_c is None:
            return None
        return SpatialEnv(inner=inner_c, halo=self.halo, halo_shortfall=0)


def halo_extend(x: jnp.ndarray, H: int, axis: str) -> jnp.ndarray:
    """(n_local, ...) -> (n_local + 2H, ...): prepend the left neighbor's
    tail, append the right neighbor's head. Unpaired ends receive zeros."""
    D = jax.lax.axis_size(axis)
    tail = jax.lax.slice_in_dim(x, x.shape[0] - H, x.shape[0])
    head = jax.lax.slice_in_dim(x, 0, H)
    if D == 1:
        from_left = jnp.zeros_like(tail)
        from_right = jnp.zeros_like(head)
    else:
        from_left = jax.lax.ppermute(
            tail, axis, [(i, i + 1) for i in range(D - 1)])
        from_right = jax.lax.ppermute(
            head, axis, [(i + 1, i) for i in range(D - 1)])
    return jnp.concatenate([from_left, x, from_right], axis=0)


def extend_fields(fields: dict, H: int, axis: str) -> dict:
    return {k: halo_extend(v, H, axis) for k, v in fields.items()}


class _PosView:
    """Minimal particle view for simlib.build_env (only .pos is read)."""

    def __init__(self, pos):
        self.pos = pos


class SpatialPlumbing(simlib.Plumbing):
    """Plumbing for steps running inside shard_map: no sorting (the global
    resort runs outside), envs are built on halo-extended local arrays."""

    @staticmethod
    def neighbor_prep(state: SimState, params: SimParams):
        axis = params.spmd_axis
        p = state.particles
        H = halo_width(params, p.pos.shape[0])
        # the resort stashes its sorted cell ids in cached_neighbors so the
        # env uses the EXACT ids the layout was built with (recomputing from
        # positions can round edge-sitters differently across fusion
        # contexts; see sim.sort_state)
        fields = {"pos": p.pos, "material": p.material,
                  "object_id": p.object_id, "is_dynamic": p.is_dynamic}
        have_cells = state.cached_neighbors is not None and \
            getattr(state.cached_neighbors, "ndim", None) == 1
        if have_cells:
            fields["cells"] = state.cached_neighbors
        ext = extend_fields(fields, H, axis)
        if have_cells:
            cells = ext["cells"]
        else:
            active = ext["material"] != MATERIAL_NONE
            cells = nblib.flat_cell_ids(ext["pos"], active, params)
        # sentinel the not-received halo slots so the extended array stays
        # cell-ascending: -1 in front (left end), num_cells at the back
        idx = jax.lax.axis_index(axis)
        D = jax.lax.axis_size(axis)
        n_ext = cells.shape[0]
        pos_i = jnp.arange(n_ext, dtype=jnp.int32)
        cells = jnp.where((pos_i < H) & (idx == 0), -1, cells)
        cells = jnp.where((pos_i >= n_ext - H) & (idx == D - 1),
                          params.num_cells, cells)

        produces = ext["material"] == MATERIAL_FLUID
        contact_produces = None
        if params.has_dynamic_rigid:
            obj = jnp.clip(ext["object_id"], 0, params.max_objects - 1)
            dyn_rigid = (ext["material"] == MATERIAL_RIGID) & \
                (ext["is_dynamic"] > 0) & \
                (state.rigid.obj_material[obj] == MATERIAL_RIGID)
            produces = produces | ((ext["is_dynamic"] > 0) & (
                state.rigid.obj_material[obj] == MATERIAL_RIGID))
            if params.contact_channels or \
                    params.rigid_solver == "shape_matching":
                contact_produces = dyn_rigid
        # halo rows compute on their owner device, not here
        owned = (pos_i >= H) & (pos_i < n_ext - H)
        produces = produces & owned
        if contact_produces is not None:
            contact_produces = contact_produces & owned
        inner = simlib.build_env(_PosView(ext["pos"]), cells, produces, params,
                                 contact_produces=contact_produces)
        shortfall = SpatialPlumbing._halo_coverage_shortfall(
            cells[H:n_ext - H], H, params)
        return state, SpatialEnv(inner=inner, halo=H,
                                 halo_shortfall=shortfall)

    @staticmethod
    def _halo_coverage_shortfall(cells_loc: jnp.ndarray, H: int,
                                 params: SimParams) -> jnp.ndarray:
        """Count local ACTIVE particles a neighbor shard needs (within one
        x-cell-plane of that neighbor's first/last owned plane) that sit
        OUTSIDE the H-slot head/tail actually exchanged. Nonzero means the
        halo was too small for the current boundary-plane population and
        cross-shard pair sums silently missed neighbors — folded into the
        overflow diagnostic. Exact: each device learns its neighbor's
        boundary plane via a scalar ppermute, so dense planes away from the
        slab face never false-positive."""
        axis = params.spmd_axis
        D = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        n_loc = cells_loc.shape[0]
        if D == 1:
            return jnp.int32(0)
        # The state is sorted by flat cell id ((cx*gy + cy)*gz + cz), so a
        # neighbor's 3^dim stencil reaches at most one plane stride + one row
        # stride + one cell back from its first owned cell: everything a
        # neighbor can need from this shard is a contiguous head/tail in cell
        # order past that threshold (conservative within the boundary row's
        # z-split; exact enough that dense-scene tests report zero).
        gy = params.grid_num[1]
        if params.dim == 3:
            reach = gy * params.grid_num[2] + params.grid_num[2] + 1
        else:
            reach = gy + 1
        act = (cells_loc >= 0) & (cells_loc < params.num_cells)
        big = jnp.int32(2 ** 30)
        cell = jnp.where(act, cells_loc, big)
        c_first = jnp.min(cell)                          # big if no active
        c_last = jnp.max(jnp.where(act, cell, -1))
        # my right neighbor's first owned cell / left neighbor's last
        right_first = jax.lax.ppermute(
            c_first, axis, [(i + 1, i) for i in range(D - 1)])
        left_last = jax.lax.ppermute(
            c_last, axis, [(i, i + 1) for i in range(D - 1)])
        i_loc = jnp.arange(n_loc, dtype=jnp.int32)
        # the tail I send right must hold every particle the right
        # neighbor's windows can reach (cells >= its first cell - reach)
        miss_r = act & (i_loc < n_loc - H) & (cell >= right_first - reach) & \
            (idx < D - 1)
        # the head I send left must hold all cells <= left's last + reach
        miss_l = act & (i_loc >= H) & (cell <= left_last + reach) & (idx > 0)
        return (jnp.sum(miss_r) + jnp.sum(miss_l)).astype(jnp.int32)


def spatial_run(kern, env: SpatialEnv, slabs: dict, fields: dict,
                params: SimParams) -> dict:
    """pair_exec.run for the spatial path: halo-extend every per-particle
    field (fresh exchange per pass — solver iterations see current neighbor
    state), run the engine on the extended arrays, crop to owned rows."""
    from ..ops import pair_exec

    H = env.halo
    axis = params.spmd_axis
    slabs_ext = extend_fields(dict(slabs or {}), H, axis)
    fields_ext = extend_fields(dict(fields), H, axis)
    out = pair_exec.run(kern, env.inner, slabs_ext, fields_ext, params)
    return {k: jax.lax.slice_in_dim(v, H, v.shape[0] - H)
            for k, v in out.items()}


def _state_specs(state: SimState, n_pad: int):
    def spec(leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1 \
                and leaf.shape[0] == n_pad:
            return P(AXIS, *([None] * (leaf.ndim - 1)))
        return P()
    return jax.tree.map(spec, state)


def shard_state(state: SimState, mesh: Mesh, params: SimParams) -> SimState:
    specs = _state_specs(state, params.n_pad)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def spatial_step_fn(params: SimParams, mesh: Mesh, template: SimState):
    """The spatially-decomposed step: global resort outside, physics inside
    shard_map. Supports every solver method (DFSPH re-sorts mid-step, so its
    step splits into two shard_map segments around a second resort)."""
    D = mesh.devices.size
    assert params.n_pad % D == 0, "n_pad must divide over the mesh"
    n_local = params.n_pad // D
    if params.resolved_pair_backend() == "pallas_dma":
        from ..ops import pair_dma
        blk = pair_dma.B * params.pair_dma_group
    else:
        blk = params.pair_block
    assert n_local % blk == 0, \
        f"local shard {n_local} must be a multiple of the engine block {blk}"
    params_sp = dataclasses.replace(params, spmd_axis=AXIS)
    # cached_neighbors transports the resort's cell ids into the shard_map
    cells_tpl = jnp.zeros((params.n_pad,), jnp.int32)
    specs = _state_specs(template.replace(cached_neighbors=cells_tpl),
                         params.n_pad)

    def resort(state):
        state, cells, _, _ = simlib.sort_state(state, params_sp)
        return state.replace(cached_neighbors=cells)

    def smap(fn):
        return jax.shard_map(fn, mesh=mesh, in_specs=(specs,),
                             out_specs=(specs, P()), check_vma=False)

    method = params.simulation_method
    if method == "dfsph":
        from ..solvers import dfsph
        seg_a = smap(functools.partial(dfsph.segment_a, params=params_sp,
                                       plumbing=SpatialPlumbing))
        seg_b = smap(functools.partial(dfsph.segment_b, params=params_sp,
                                       plumbing=SpatialPlumbing))

        def step(state):
            state = resort(state)
            state, diag_a = seg_a(state)
            state = resort(state)
            state, diag = seg_b(state)
            diag.update(diag_a)
            return state, diag
    else:
        inner = simlib.get_step_fn(params_sp, plumbing=SpatialPlumbing)

        def inner_fn(state):
            cells_local = state.cached_neighbors
            state, diag = inner(state)
            # solvers cache their env; restore the cells-shaped slot so the
            # shard_map output structure matches its input
            return state.replace(
                cached_neighbors=jnp.zeros_like(cells_local)), diag
        inner_sm = smap(inner_fn)

        def step(state):
            state = resort(state)
            return inner_sm(state)

    return jax.jit(step, donate_argnums=0)
