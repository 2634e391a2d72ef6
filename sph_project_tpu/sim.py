"""Simulation orchestration: one jitted step per solver method.

This is the analogue of the reference's ``BaseSolver.step`` + driver loop
(base_solver.py:683-696, run_simulation.py:116-155), restructured so a full
step — neighbor sort, dense pair-window build, physics, pressure solve, rigid
dynamics, boundary, deferred-entry activation — is a single XLA program with
no host round trips. Host code only touches the state at export boundaries.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .core.params import MATERIAL_FLUID, MATERIAL_NONE, MATERIAL_RIGID, SimParams
from .core.state import ParticleState, RigidState, SimState
from .ops import neighbors as nblib
from .ops import pairs
from .rigid import integrator as rigidlib
from .solvers import common


def permuted_keys(params: SimParams) -> tuple:
    """Per-particle arrays that must follow the cell sort — everything whose
    value CARRIES ACROSS the sort boundary. Arrays recomputed in-step before
    any read (acc, pressure, dfsph_alpha) and method-foreign carries are
    skipped: at 405k each permuted component costs ~1 ms/step on v5e.

    Audit (round 2): acc/pressure are fully rewritten before use by every
    solver (gravity_acceleration assigns; PCISPH/IISPH re-zero pressure,
    PCISPH.py:153-162 / IISPH.py:164); dfsph_alpha is recomputed right after
    every resort (density_and_alpha); visc_x is the implicit-CG warm start
    only; iisph_density_star is IISPH's stale-density quirk carry only;
    rigid_rest_pos / entry_* matter only when the scene has rigid bodies /
    deferred entries."""
    keys = ["pos", "vel", "mass", "rest_volume", "density", "material",
            "object_id", "is_dynamic"]
    if params.has_rigid:
        keys.append("rigid_rest_pos")
    if params.has_entries:
        keys += ["entry_time", "entry_material"]
    extras = []
    if params.viscosity_method == "implicit":
        extras.append("visc_x")
    if params.simulation_method == "iisph":
        extras.append("iisph_density_star")
    if params.dfsph_warm_start:
        extras.append("dfsph_kappa")
    if params.dfsph_warm_start_div:
        extras.append("dfsph_kappa_v")
    return tuple(keys), tuple(extras)


def sort_state(state: SimState, params: SimParams,
               exact: bool = False):
    """Sort the carried per-particle arrays by grid cell (the reference's
    counting sort, base_container.py:495-547).

    Measured on v5e: argsort + the one-hot MXU permute kernel (ops/permute.py)
    beats both a multi-operand lax.sort and XLA's per-field gathers. The
    kernel path is skipped off-TPU and under spatial sharding (a Pallas
    custom call cannot be auto-partitioned). ``exact=True`` forces the plain
    gather path — required for shuffles bigger than the kernel's sparse-fix
    budget (a fresh state's first sort; scenes with big deferred-entry
    objects set params.sort_kernel=False for the same reason).

    Returns (sorted state, sorted cell ids, sort overflow count). The cell
    ids MUST be consumed by the window build rather than recomputed from the
    sorted positions: edge-sitting particles (a settled lattice puts many
    exactly on cell boundaries) can round to DIFFERENT cells under different
    XLA fusion contexts (fma vs mul+add), and a layout/window disagreement
    on the plane id silently degrades windows (measured: ~700 phantom
    multi-plane blocks and ~6k overflow per step at 405k)."""
    p = state.particles
    active = p.material != MATERIAL_NONE
    cells = nblib.flat_cell_ids(p.pos, active, params)
    cells_sorted = None
    sdiag = dict(sort_overflow_inc=jnp.int32(0),
                 sort_crossers=jnp.int32(0),
                 sort_inc_taken=jnp.int32(0))
    if params.resolved_pair_backend() == "pallas_dma":
        # plane-padded layout: sub-blocks never cross x-planes, which keeps
        # the DMA engine's rectangle hulls compact (ops/neighbors.py)
        prev = state.cached_neighbors
        if (params.sort_incremental and not exact and not params.spmd_axis
                and prev is not None
                and getattr(prev, "cells_sorted", None) is not None):
            # HYBRID: count the crossers exactly (cheap elementwise +
            # reduce) and take the incremental branch only when both fit
            # the static budget — the coherent fall crosses ~n_fluid cells
            # in single steps (measured: full-protocol overflow 346k,
            # bench_r4c_warm_inc.log) and MUST full-sort; the settled regime
            # crosses a few thousand and rides the cheap branch. The cond
            # sits at the step's one serial dependency point (everything
            # downstream consumes perm), so its scheduling cost is the
            # smallest a mid-step cond can be — hardware A/B'd vs the
            # always-full sort before default-on.
            n_mov, n_lv = nblib.crosser_counts(cells, prev.cells_sorted,
                                               params)
            K = nblib.inc_sort_budget(cells.shape[0], params)
            fits = (n_mov <= K) & (n_lv <= K)

            def _inc(_):
                perm, ovf = nblib.incremental_plane_padded_permutation(
                    cells, prev.cells_sorted, prev.t_start, prev.t_end,
                    params)
                return perm, ovf

            def _full(_):
                return (nblib.plane_padded_permutation(cells, params),
                        jnp.int32(0))

            perm, inc_ovf = jax.lax.cond(fits, _inc, _full, None)
            sdiag = dict(sort_overflow_inc=inc_ovf,
                         sort_crossers=jnp.maximum(n_mov, n_lv),
                         sort_inc_taken=fits.astype(jnp.int32))
        else:
            perm, cells_sorted = nblib.plane_padded_permutation(
                cells, params, return_cells=True)
    else:
        perm = nblib.sort_permutation(cells)

    pkeys, extras = permuted_keys(params)
    overflow = jnp.int32(0)
    use_kernel = (not exact and params.sort_kernel and
                  params.resolved_pair_backend() == "pallas_dma" and
                  jax.default_backend() == "tpu" and not params.spmd_axis)
    if use_kernel:
        from .ops import permute as permlib
        arrays = {k: getattr(p, k) for k in pkeys}
        arrays.update({k: getattr(state, k) for k in extras})
        # the incremental layout shifts slightly more slots than the stable
        # argsort (arrivals land after stayers) — give its sparse-fix pass
        # double the budget (measured ~2400 uncovered vs the 2048 default
        # at the 1.23M headline scene)
        k_fix = permlib.K_FIX * 2 if params.sort_incremental else permlib.K_FIX
        out, overflow = permlib.permute_fields(perm, arrays, k_fix=k_fix)
        state = state.replace(**{k: out.pop(k) for k in extras})
        p = p.replace(**out)
    else:
        def permute(a):
            # (N, d) gathers run at tiny-slice (pathological) rate on TPU;
            # per-column scalar gathers + restack are ~10x faster
            if a.ndim == 1:
                return a[perm]
            return jnp.stack([a[:, d][perm] for d in range(a.shape[1])],
                             axis=1)

        p = p.replace(**{k: permute(getattr(p, k)) for k in pkeys})
        state = state.replace(
            **{k: permute(getattr(state, k)) for k in extras})
    if cells_sorted is None:
        cells_sorted = cells[perm]
    return state.replace(particles=p), cells_sorted, overflow, sdiag


def produces_output(p: ParticleState, rigid: RigidState,
                    params: SimParams) -> jnp.ndarray:
    """Per-particle mask of rows whose pair sums are ever read: fluid and
    dynamic-rigid-body particles. Static walls never read their own sums,
    and neither do emitter placeholders (dynamic rigid slots of a
    FLUID-material object above g_upper — they advect ballistically until
    they convert; base_solver.py:660-666)."""
    if not params.has_dynamic_rigid:
        # no dynamic bodies -> only fluid rows are ever read (saves the
        # per-step (N,)-gather from the object table)
        return p.material == MATERIAL_FLUID
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    obj_mat = common.object_gather({"m": rigid.obj_material}, obj,
                                   params.max_objects)["m"]
    dyn_rigid_body = (p.is_dynamic > 0) & (obj_mat == MATERIAL_RIGID)
    return (p.material == MATERIAL_FLUID) | dyn_rigid_body


def dynamic_rigid_mask(p: ParticleState, rigid: RigidState,
                       params: SimParams) -> jnp.ndarray:
    """Dynamic-rigid-body particles (true bodies, not emitter placeholders:
    their OBJECT material must be rigid)."""
    obj = jnp.clip(p.object_id, 0, params.max_objects - 1)
    obj_mat = common.object_gather({"m": rigid.obj_material}, obj,
                                   params.max_objects)["m"]
    return (p.material == MATERIAL_RIGID) & (p.is_dynamic > 0) & \
        (obj_mat == MATERIAL_RIGID)


def build_env(p: ParticleState, cells_sorted: jnp.ndarray,
              produces: jnp.ndarray, params: SimParams,
              keep_layout: bool = True,
              contact_produces: jnp.ndarray | None = None):
    """Window metadata over cell-sorted particles (engine-dispatched).

    ``contact_produces``: when given (dynamic-rigid coupling scenes), a
    second env over the same layout is attached as ``env.contact_env``,
    its windows covering only these producers — the rigid contact pass's
    many output channels make it ~7x a normal pass, so it must not scan
    fluid superblocks (rigid/integrator.py rigid_contact_data)."""
    if params.resolved_pair_backend() == "pallas_dma":
        from .ops import pair_dma
        env = pair_dma.make_dma_env(p.pos, cells_sorted, params,
                                    needs_output=produces,
                                    keep_layout=keep_layout)
        if contact_produces is not None:
            envc = pair_dma.make_dma_env(p.pos, cells_sorted, params,
                                         needs_output=contact_produces,
                                         keep_layout=False)
            env = env.replace(contact_env=envc)
        return env
    needs_output = jnp.any(produces.reshape(-1, params.pair_block), axis=1)
    return pairs.make_pair_env(p.pos, cells_sorted, params,
                               needs_output=needs_output)


class Plumbing:
    """Shared step stages. Solver modules receive this to avoid import cycles
    and so alternative implementations (spatial shard_map, Pallas-fused) can
    be swapped in."""

    @staticmethod
    def neighbor_prep(state: SimState, params: SimParams,
                      exact_sort: bool = False
                      ) -> Tuple[SimState, pairs.PairEnv]:
        """Sort every per-particle array by grid cell and build the dense
        pair windows (the reference's prepare_neighborhood_search,
        base_container.py:544-547)."""
        state, cells_sorted, perm_ovf, sdiag = sort_state(
            state, params, exact=exact_sort)
        inc_ovf = sdiag["sort_overflow_inc"]
        sort_ovf = perm_ovf + inc_ovf
        p = state.particles
        produces = produces_output(p, state.rigid, params)
        # an exact-sort caller is prepare(): a DIFFERENT compiled program
        # from the step, whose cell binning can disagree with the step's on
        # lattice edge-sitters (fusion rounding). Its env must not offer an
        # incremental-sort baseline — the first step then takes the full
        # sort path, and every later step compares cells computed by the
        # SAME program (exact).
        contact_produces = None
        # (the spatial path builds its own over halo-extended arrays —
        # SpatialPlumbing.neighbor_prep, parallel/spatial.py)
        if (params.has_dynamic_rigid and
                (params.contact_channels or
                 params.rigid_solver == "shape_matching")):
            contact_produces = dynamic_rigid_mask(p, state.rigid, params)
        env = build_env(p, cells_sorted, produces, params,
                        keep_layout=not exact_sort,
                        contact_produces=contact_produces)
        env = env.replace(overflow=env.overflow + sort_ovf,
                          sort_overflow=sort_ovf,
                          sort_overflow_inc=inc_ovf,
                          sort_crossers=sdiag["sort_crossers"],
                          sort_inc_taken=sdiag["sort_inc_taken"])
        return state, env

    @staticmethod
    def non_pressure_acceleration(
        p: ParticleState, rigid: RigidState, env: pairs.PairEnv, sl: dict,
        state: SimState, params: SimParams,
    ) -> Tuple[ParticleState, RigidState]:
        """gravity (assign) + surface tension + viscosity
        (base_solver.py:190-200)."""
        acc = common.gravity_acceleration(p, params)
        if params.viscosity_method == "standard":
            a_v, rf, rt = common.nonpressure_fused(p, rigid, env, sl, params)
            acc = acc + a_v
            rigid = rigid.replace(force=rigid.force + rf, torque=rigid.torque + rt)
            p = p.replace(acc=acc)
        elif params.viscosity_method == "implicit":
            from .solvers import viscosity_cg
            acc = acc + common.surface_tension_acceleration(p, env, sl, params)
            p = p.replace(acc=acc)
            p, rigid, state = viscosity_cg.implicit_viscosity_solve(
                p, rigid, state, env, sl, params)
        else:
            raise NotImplementedError(params.viscosity_method)
        return p, rigid

    @staticmethod
    def activate_entries(state: SimState, params: SimParams) -> SimState:
        """entryTime-gated object insertion as mask flips (the reference's
        insert_object / init_rigid_body run per step; base_container.py:212-341,
        bullet_solver.py:77-128)."""
        p, rigid = state.particles, state.rigid
        t = state.t
        enter = (p.material == MATERIAL_NONE) & (p.entry_material != MATERIAL_NONE) \
            & (p.entry_time <= t)
        p = p.replace(material=jnp.where(enter, p.entry_material, p.material))
        r_enter = (rigid.present == 0) & (rigid.entry_time <= t) & \
            (rigid.obj_material != MATERIAL_NONE)
        rigid = rigid.replace(present=jnp.where(r_enter, 1, rigid.present))
        return state.replace(particles=p, rigid=rigid)

    @staticmethod
    def rigid_mid(state: SimState, env: pairs.PairEnv,
                  params: SimParams) -> SimState:
        """Rigid dynamics + entry activation + rigid particle renewal — the
        ``rigid_solver.step(); insert_object(); renew_rigid_particle_state()``
        block every method runs mid-step (e.g. WCSPH.py:39-43)."""
        p, rigid = state.particles, state.rigid

        shape_matching = params.rigid_solver == "shape_matching"
        # static-only rigid scenes (e.g. fluid + domain-box walls) skip body
        # integration and the per-particle (com, rot) renewal gathers
        # entirely — both are masked no-ops when no body is dynamic
        if params.has_rigid and params.has_dynamic_rigid:
            # the contact passes only produce output for dynamic-rigid
            # particles; against the shared env their many channels scan
            # every fluid superblock (measured 706 ms/step at the
            # nine-rigid scene) — use the rigid-producer env when built
            env_c = getattr(env, "contact_env", None)
            env_c = env if env_c is None else env_c
            if shape_matching:
                # particles integrate freely here, so body-level impulses
                # don't apply; DEM springs feed the free integration instead
                cf, ct = rigidlib.rigid_contact_wrench(p, rigid, env_c,
                                                       params)
                rigid = rigid.replace(force=rigid.force + cf,
                                      torque=rigid.torque + ct)
                from .rigid import shape_matching as smlib
                p, rigid = smlib.shape_matching_step(p, rigid, params)
            else:
                # contact impulses require a dynamic body; without one the
                # pair pass could only produce inert static-static records
                contact = (rigidlib.rigid_contact_data(p, rigid, env_c,
                                                       params)
                           if params.contact_channels else None)
                rigid = rigidlib.rigid_body_step(p, rigid, params,
                                                 contact=contact)

        state = state.replace(particles=p, rigid=rigid)
        state = Plumbing.activate_entries(state, params)
        p, rigid = state.particles, state.rigid
        if params.has_rigid and params.has_dynamic_rigid and not shape_matching:
            # shape matching already placed its particles; the (com, rot)
            # renewal is the integrator-backend path (base_solver.py:615-629)
            p = common.renew_rigid_particle_state(p, rigid, params)
        return state.replace(particles=p, rigid=rigid)

    @staticmethod
    def rigid_and_tail(state: SimState, env: pairs.PairEnv, sl: dict,
                       params: SimParams) -> SimState:
        """rigid_mid + boundary clamp + time/volume tail (the feed-forward
        methods' step ending; base_solver.py:692-696)."""
        state = Plumbing.rigid_mid(state, env, params)
        p = state.particles
        p = common.enforce_domain_boundary(p, params, MATERIAL_FLUID)
        if params.has_dynamic_rigid:
            # positions moved since the sort: re-slab them (+ object ids).
            # Static-only scenes keep prepare-time volumes (apply is a
            # no-op for is_dynamic==0 rows)
            fresh = pairs.slab_pack(env, {"pos": p.pos,
                                          "object_id": p.object_id})
            sl = dict(sl, object_id=fresh["object_id"])
            p = common.compute_rigid_particle_volume(p, env, sl, params,
                                                     pos_slab=fresh["pos"])
        return state.replace(
            particles=p,
            t=state.t + params.dt,
            step_count=state.step_count + 1,
        )

    @staticmethod
    def diagnostics(state: SimState, env: pairs.PairEnv,
                    params: SimParams, extra: dict | None = None) -> dict:
        p = state.particles
        fluid = p.material == MATERIAL_FLUID
        nf = jnp.maximum(common.global_sum(fluid, params), 1)
        d = dict(
            fluid_num=common.global_sum(fluid, params),
            density_avg=common.global_sum(
                jnp.where(fluid, p.density, 0.0), params) / nf,
            density_max=common.global_max(
                jnp.where(fluid, p.density, 0.0), params),
            vel_max=common.global_max(
                jnp.where(fluid[:, None], jnp.abs(p.vel), 0.0), params),
            # particles sitting AT the CFL speed cap (vel_capped > 0 means
            # the cap rescaled runaways this step — never silent)
            vel_capped=(common.global_sum(
                fluid & (jnp.sum(p.vel * p.vel, axis=-1) >= (0.999 * (
                    params.vel_cap_cfl * params.particle_diameter
                    / params.dt)) ** 2), params).astype(jnp.int32)
                if params.vel_cap_cfl > 0 else jnp.int32(0)),
            neighbor_overflow=common.global_sum(env.overflow, params).astype(
                jnp.int32),
        )
        soi = getattr(env, "sort_overflow_inc", None)
        if soi is not None:
            d["sort_overflow_inc"] = soi
        for k in ("sort_crossers", "sort_inc_taken"):
            v = getattr(env, k, None)
            if v is not None:
                d[k] = v
        so = getattr(env, "sort_overflow", None)
        d["sort_overflow"] = (
            common.global_sum(so, params).astype(jnp.int32)
            if so is not None else jnp.int32(0))
        if extra:
            d.update(extra)
        return d


def get_step_fn(params: SimParams, plumbing=None
                ) -> Callable[[SimState], Tuple[SimState, dict]]:
    """Resolve the solver method to a step function (the reference's driver
    dispatch, run_simulation.py:46-63)."""
    plumbing = plumbing or Plumbing
    method = params.simulation_method
    if method == "wcsph":
        from .solvers import wcsph
        fn = functools.partial(wcsph.step, params=params, plumbing=plumbing)
    elif method == "dfsph":
        from .solvers import dfsph
        fn = functools.partial(dfsph.step, params=params, plumbing=plumbing)
    elif method == "pcisph":
        from .solvers import pcisph
        fn = functools.partial(pcisph.step, params=params, plumbing=plumbing)
    elif method == "iisph":
        from .solvers import iisph
        fn = functools.partial(iisph.step, params=params, plumbing=plumbing)
    elif method == "pbf":
        from .solvers import pbf
        fn = functools.partial(pbf.step, params=params, plumbing=plumbing)
    else:
        raise NotImplementedError(f"simulation method {method}")

    def step_with_overflow_accounting(state: SimState):
        """Carry overflow ACCUMULATORS in the state so callers that fetch
        diagnostics only every k steps (bench.py times 25-step chunks)
        cannot miss a corrupt intermediate step — round 4's incremental-sort
        corruption fired sort_overflow=219168 on step 0 and was invisible to
        the chunked gate by step 25."""
        state, diag = fn(state)
        so = diag.get("sort_overflow", jnp.int32(0))
        wo = diag["neighbor_overflow"] - so
        sort_acc = state.sort_overflow_acc + so
        win_max = jnp.maximum(state.window_overflow_max, wo)
        state = state.replace(sort_overflow_acc=sort_acc,
                              window_overflow_max=win_max)
        diag["sort_overflow_acc"] = sort_acc
        diag["window_overflow_max"] = win_max
        return state, diag

    return step_with_overflow_accounting


def prepare(state: SimState, params: SimParams) -> SimState:
    """Initial setup matching BaseSolver.prepare (base_solver.py:683-690):
    activate t=0 objects, emitter flip, place rigid particles, compute Akinci
    volumes; DFSPH additionally seeds density + alpha (DFSPH.py:321-324)."""
    state = Plumbing.activate_entries(state, params)
    p, rigid = state.particles, state.rigid
    p = common.prepare_emitter(p, params)
    p = common.renew_rigid_particle_state(p, rigid, params)
    state = state.replace(particles=p)
    # the first sort of a fresh state is an arbitrary shuffle — exact gather
    state, env = Plumbing.neighbor_prep(state, params, exact_sort=True)
    p = state.particles
    if params.has_rigid:
        # one-time volumes for ALL rigid particles (incl. static walls, whose
        # blocks are exempt from the dense engine's big-window tier)
        p = common.compute_rigid_volume_fixedk(p, params)
    state = state.replace(particles=p, cached_neighbors=env)
    if params.simulation_method == "dfsph":
        from .solvers import dfsph
        sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
        p = p.replace(density=common.compute_density(p, env, sl, params))
        alpha = dfsph.compute_alpha(p, env, sl, params)
        state = state.replace(particles=p, dfsph_alpha=alpha)
    return state


@functools.lru_cache(maxsize=64)
def _jitted_step(params: SimParams):
    # donate the carried state: without donation the jit holds input AND
    # output copies of every particle array, which at 1.23M particles is the
    # difference between fitting one chip's HBM or not. Cached on the
    # (hashable) params so re-created Simulations never recompile.
    return jax.jit(get_step_fn(params), donate_argnums=0)


@functools.lru_cache(maxsize=64)
def _jitted_prepare(params: SimParams):
    return jax.jit(functools.partial(prepare, params=params))


class Simulation:
    """User-facing driver: holds the jitted step and the scene metadata."""

    def __init__(self, scene, state: SimState):
        self.scene = scene
        self.params = scene.params
        self._prepare = _jitted_prepare(self.params)
        self._step = _jitted_step(self.params)
        self.state = self._prepare(state)

    def step(self) -> dict:
        self.state, diag = self._step(self.state)
        return diag

    def run(self, n_steps: int) -> dict:
        """Run n_steps fully on device via lax.scan; returns stacked diags."""
        if getattr(self, "_scan", None) is None:
            step_fn = get_step_fn(self.params)

            @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
            def scan_steps(state, n):
                def body(s, _):
                    s, d = step_fn(s)
                    return s, d
                return jax.lax.scan(body, state, None, length=n)
            self._scan = scan_steps
        self.state, diags = self._scan(self.state, n_steps)
        return diags
