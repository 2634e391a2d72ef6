"""Scene building: JSON config -> (SimParams, SimState, Scene).

The reference builds scenes imperatively at runtime (BaseContainer.__init__ +
insert_object, base_container.py:10-381): meshes are voxelized, blocks are
latticed, and objects with a future ``entryTime`` are added mid-simulation by
a host loop. Here every particle that will *ever* exist is seeded up front
into the fixed-capacity state; deferred entry becomes an on-device mask flip
(entry_time / entry_material), so the jitted step never changes shape.

Mesh geometry paths are resolved against ``SPH_ASSET_ROOT`` (default:
the reference checkout) so the original scene files work unchanged.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np
import jax.numpy as jnp

from .core.params import MATERIAL_FLUID, MATERIAL_NONE, MATERIAL_RIGID, SimParams, make_params
from .core.state import ParticleState, RigidState, SimState, zeros_state
from .geometry import mesh as meshlib
from .geometry import shapes
from .utils.config import SimConfig

ASSET_ROOT = os.environ.get("SPH_ASSET_ROOT", "/root/reference")
# first-party procedural stand-ins (data/make_models.py): bbox-matched
# equivalents of the reference's binary mesh assets, used when neither the
# literal path nor the reference checkout provides the file — the repo is
# self-contained without SPH_ASSET_ROOT
BUILTIN_MODELS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "models_builtin")


def _resolve_path(path: str) -> str:
    if os.path.exists(path):
        return path
    alt = os.path.join(ASSET_ROOT, path.lstrip("./"))
    if os.path.exists(alt):
        return alt
    builtin = os.path.join(BUILTIN_MODELS, os.path.basename(path))
    if os.path.exists(builtin):
        return builtin
    raise FileNotFoundError(
        f"geometry file {path} (also tried {alt} and {builtin})")


@dataclass
class SceneObject:
    """Host-side metadata for one object (for export and inspection)."""
    object_id: int
    material: int
    is_dynamic: bool
    entry_time: float
    particle_num: int
    color: tuple = (255, 255, 255)
    visible: bool = True
    # for rigid bodies: the transformed mesh for OBJ export
    mesh_verts: np.ndarray | None = None
    mesh_faces: np.ndarray | None = None


@dataclass
class Scene:
    params: SimParams
    config: SimConfig
    objects: List[SceneObject] = field(default_factory=list)
    fluid_object_ids: List[int] = field(default_factory=list)
    rigid_object_ids: List[int] = field(default_factory=list)


def _euler_or_axis_rotation(body: Dict[str, Any], dynamic: bool) -> np.ndarray:
    angle = float(body.get("rotationAngle", 0.0)) / 360.0 * 2.0 * math.pi
    axis = np.asarray(body.get("rotationAxis", [0, 1, 0]), np.float64)
    if dynamic:
        # bullet path: Euler XYZ of axis*angle (bullet_solver.py:102-107)
        return meshlib.rotation_matrix_euler_xyz(axis * angle)
    # static path: trimesh axis-angle (base_container.py:621-624)
    return meshlib.rotation_matrix_axis_angle(axis, angle)


def load_scene(scene_file: str | None = None, config: SimConfig | None = None,
               **param_overrides) -> tuple[Scene, SimState]:
    """Build params + fully-seeded initial state from a scene JSON."""
    cfg = config if config is not None else SimConfig(scene_file)

    dim = len(cfg.get_cfg("domainEnd"))
    dx = cfg.get_cfg("particleRadius") or 0.01
    spacing = cfg.get_cfg("particleSpacing") or 2.0 * dx
    dh = cfg.get_cfg("supportRadius")
    g_upper = cfg.get_cfg("gravitationUpper")
    density0 = cfg.get_cfg("density0") or 1000.0
    add_domain_box = bool(cfg.get_cfg("addDomainBox"))
    box_thickness = 0.03 if add_domain_box else 0.0

    def _get(name, default):
        # NB: explicit None test — scene values like viscosity 0.0 or a zero
        # gravity vector are valid and must not fall back to defaults
        v = cfg.get_cfg(name)
        return default if v is None else v

    kw = dict(
        dim=dim,
        particle_radius=dx,
        particle_spacing=spacing,
        domain_start=tuple(_get("domainStart", (0.0,) * dim)),
        domain_end=tuple(cfg.get_cfg("domainEnd")),
        density0=density0,
        gravity=tuple(_get("gravitation", (0.0, -9.81, 0.0)[:dim])),
        dt=_get("timeStepSize", 1e-3),
        viscosity=_get("viscosity", 0.01),
        simulation_method=_get("simulationMethod", "dfsph"),
        viscosity_method=_get("viscosityMethod", "standard"),
        rigid_solver=_get("rigidSolver", "integrator"),
        wall_thickness=box_thickness,
    )
    if (cfg.get_cfg("simulationMethod") or "dfsph") == "pbf":
        kw["kernel_type"] = "poly6"   # PBF overrides the kernels (PBF.py:21-47)
        ck = cfg.get_cfg("pbfCorrK")
        if ck is not None:
            kw["pbf_corr_k"] = ck
        cq = cfg.get_cfg("pbfCorrDeltaQ")
        if cq is not None:
            kw["pbf_corr_delta_q"] = cq
    ws = cfg.get_cfg("dfsphWarmStart")
    if ws is not None:
        kw["dfsph_warm_start"] = bool(ws)
    wsd = cfg.get_cfg("dfsphWarmStartDiv")
    if wsd is not None:
        kw["dfsph_warm_start_div"] = bool(wsd)
    wf = cfg.get_cfg("dfsphWarmFactor")
    if wf is not None:
        kw["dfsph_warm_factor"] = float(wf)
    wfh = cfg.get_cfg("dfsphWarmFactorHi")
    if wfh is not None:
        kw["dfsph_warm_factor_hi"] = float(wfh)
    wg = cfg.get_cfg("dfsphWarmGate")
    if wg is not None:
        kw["dfsph_warm_gate"] = float(wg)
    om = cfg.get_cfg("dfsphOmega")
    if om is not None:
        kw["dfsph_omega"] = float(om)
    wq = cfg.get_cfg("dfsphWarmQuietCfl")
    if wq is not None:
        kw["dfsph_warm_quiet_cfl"] = float(wq)
    vc = cfg.get_cfg("velCapCfl")
    if vc is not None:
        kw["vel_cap_cfl"] = float(vc)
    si = cfg.get_cfg("sortIncremental")
    if si is not None:
        kw["sort_incremental"] = bool(si)
    if dh is not None:
        kw["support_radius"] = dh
    if g_upper is not None:
        kw["g_upper"] = g_upper
    vb = cfg.get_cfg("viscosity_b")
    kw["viscosity_b"] = vb if vb is not None else kw["viscosity"]
    kw.update(param_overrides)

    # ---- collect every object's particles (host numpy) ---------------------
    chunks: list[dict] = []   # one per object: dict of arrays + metadata
    scene_objects: list[SceneObject] = []
    v0 = 0.8 * (2.0 * dx) ** dim   # reference V0, base_container.py:49

    def add_chunk(obj_id, pts, vel, dens, mat, dynamic, entry, color, visible,
                  rest_pos=None, mesh_vf=None):
        n = pts.shape[0]
        chunks.append(dict(
            obj_id=obj_id, pos=pts.astype(np.float32),
            vel=np.broadcast_to(np.asarray(vel, np.float32), (n, dim)).copy(),
            density=np.full(n, dens, np.float32),
            material=mat, dynamic=int(dynamic), entry=float(entry),
            rest_pos=(rest_pos if rest_pos is not None else pts).astype(np.float32),
        ))
        scene_objects.append(SceneObject(
            object_id=obj_id, material=mat, is_dynamic=bool(dynamic),
            entry_time=float(entry), particle_num=n, color=tuple(color),
            visible=bool(visible),
            mesh_verts=None if mesh_vf is None else mesh_vf[0],
            mesh_faces=None if mesh_vf is None else mesh_vf[1],
        ))

    fluid_ids, rigid_ids = [], []

    def _vec(v, default):
        # 2D scenes in the wild carry 3-vectors for translation/scale
        # (the reference simply ignores the extras); trim to dim
        a = np.asarray(v if v is not None else default, np.float64)
        return a[:dim]

    for blk in cfg.get_fluid_blocks():
        offset = _vec(blk.get("translation"), [0.0] * dim)
        start = np.asarray(blk["start"], np.float64)[:dim] + offset
        end = np.asarray(blk["end"], np.float64)[:dim] + offset
        scale = _vec(blk.get("scale"), [1.0] * dim)
        pts = shapes.cube_lattice(start, (end - start) * scale, spacing)
        add_chunk(blk["objectId"], pts,
                  list(_vec(blk.get("velocity"), [0.0] * dim)),
                  blk.get("density", 1000.0), MATERIAL_FLUID, 1,
                  blk.get("entryTime", -1.0), blk.get("color", (50, 100, 200)),
                  blk.get("visible", 1))
        fluid_ids.append(blk["objectId"])

    for body in cfg.get_fluid_bodies():
        verts, faces = meshlib.load_obj(_resolve_path(body["geometryFile"]))
        verts = verts * np.asarray(body.get("scale", [1, 1, 1]), np.float64)
        R = _euler_or_axis_rotation(body, dynamic=False)
        center = verts.mean(axis=0)
        verts = (verts - center) @ R.T + center
        verts = verts + np.asarray(body.get("translation", [0, 0, 0]), np.float64)
        pts = meshlib.fill_lattice(verts, faces, spacing, offset_half_pitch=False)
        add_chunk(body["objectId"], pts, body.get("velocity", [0.0] * dim),
                  body.get("density", 1000.0), MATERIAL_FLUID, 1,
                  body.get("entryTime", -1.0), body.get("color", (50, 100, 200)),
                  body.get("visible", 1))
        fluid_ids.append(body["objectId"])

    rigid_meta: dict[int, dict] = {}
    for body in cfg.get_rigid_bodies():
        obj_id = body["objectId"]
        dynamic = bool(body.get("isDynamic", False))
        verts, faces = meshlib.load_obj(_resolve_path(body["geometryFile"]))
        verts = verts * np.asarray(body.get("scale", [1, 1, 1]), np.float64)
        translation = np.asarray(body.get("translation", [0, 0, 0]), np.float64)
        R = _euler_or_axis_rotation(body, dynamic)
        if dynamic:
            # body-frame sampling; placement happens via (com, rot) like the
            # bullet path (bullet_solver.py:109-123, base_solver.py:615-629)
            body_pts = meshlib.fill_lattice(verts, faces, spacing)
            world_pts = body_pts @ R.T + translation
            export_verts = verts
        else:
            center = verts.mean(axis=0)
            verts = (verts - center) @ R.T + center + translation
            body_pts = meshlib.fill_lattice(verts, faces, spacing)
            world_pts = body_pts
            export_verts = verts
        vel = body.get("velocity", [0.0] * dim) if dynamic else [0.0] * dim
        add_chunk(obj_id, world_pts.astype(np.float32), vel,
                  body.get("density", 1000.0), MATERIAL_RIGID, dynamic,
                  body.get("entryTime", -1.0), body.get("color", (255, 255, 255)),
                  body.get("visible", 1),
                  rest_pos=body_pts.astype(np.float32),
                  mesh_vf=(export_verts, faces))
        rigid_ids.append(obj_id)
        rigid_meta[obj_id] = dict(
            dynamic=dynamic, translation=translation, rot=R,
            vel=np.asarray(vel, np.float64),
            mass=body.get("density", 1000.0) * v0 * world_pts.shape[0],
        )

    if cfg.get_rigid_blocks():
        raise NotImplementedError("RigidBlocks (unimplemented in the reference too, "
                                  "base_container.py:106,346)")

    n_objects = len(chunks)
    domain_start = np.asarray(kw["domain_start"], np.float64)
    domain_end = np.asarray(kw["domain_end"], np.float64)
    if add_domain_box:
        pad = kw.get("support_radius", dx * (4.0 if dim == 3 else 3.0))
        box_lower = domain_start + pad
        box_size = (domain_end - domain_start) - 2 * pad
        pts = shapes.box_shell_lattice(box_lower, box_size, spacing, box_thickness)
        box_id = n_objects
        add_chunk(box_id, pts, [0.0] * dim, density0, MATERIAL_RIGID, 0, -1.0,
                  (127, 127, 127), False)

    n_particles = sum(c["pos"].shape[0] for c in chunks)
    kw["has_rigid"] = any(c["material"] == MATERIAL_RIGID for c in chunks) or \
        any(c["entry"] > 0 for c in chunks)   # emitter flips fluid->rigid too
    if cfg.get_cfg("gravitationUpper") is not None:
        kw["has_rigid"] = True
    # dynamic-body machinery (integration, renewal, wrenches, per-step
    # pseudo-volumes) only runs when a rigid BODY can move; emitter
    # placeholders advect inside update_fluid_position and never read it
    kw["has_dynamic_rigid"] = any(
        c["material"] == MATERIAL_RIGID and c["dynamic"] for c in chunks)
    kw["has_entries"] = any(c["entry"] > 0 for c in chunks) or \
        cfg.get_cfg("gravitationUpper") is not None
    # every dynamic rigid body gets its own exact contact channel (see
    # rigid_contact_data); static geometry shares one merged channel
    if "contact_channels" not in param_overrides:
        kw["contact_channels"] = tuple(sorted(
            c["obj_id"] for c in chunks
            if c["material"] == MATERIAL_RIGID and c["dynamic"]))
    # Deferred entries shuffle pad-gap slots on their activation step; the
    # sort kernel can only repair K_FIX scattered out-of-span slots exactly
    # (ops/permute.py), and slots beyond that budget are ZEROED (particles
    # silently deleted, surfaced only as an overflow counter). Any entry
    # burst that could exceed the budget disables the kernel for the run.
    from .ops.permute import K_FIX
    if any(c["entry"] > 0 and c["pos"].shape[0] > K_FIX for c in chunks):
        kw["sort_kernel"] = False
    if "halo_plane_max" not in param_overrides:
        # max particles in one x-cell-plane of the seeded scene: the spatial
        # halo (parallel/spatial.halo_width) must cover one neighbor plane
        dh_eff = kw.get("support_radius", dx * (4.0 if dim == 3 else 3.0))
        xs = np.concatenate([c["pos"][:, 0] for c in chunks])
        planes = np.floor(
            (xs.astype(np.float64) - kw["domain_start"][0]) / dh_eff
        ).astype(np.int64)
        kw["halo_plane_max"] = int(np.bincount(
            planes - planes.min()).max()) if planes.size else 0
    params = make_params(n_particles, **kw)

    if "pair_slab" not in param_overrides:
        # size the dense-pair window caps for this scene's actual occupancy
        # (ops/pairs.py; runtime overflow counter covers later densification)
        from .ops.pairs import estimate_slab_sizes
        all_pos = np.concatenate([c["pos"] for c in chunks]).astype(np.float32)
        pad = np.zeros((params.n_pad - n_particles, dim), np.float32)
        act = np.zeros(params.n_pad, bool)
        act[:n_particles] = True
        out_mask = np.zeros(params.n_pad, bool)
        cur = 0
        for c in chunks:
            m = c["pos"].shape[0]
            produces = (c["material"] == MATERIAL_FLUID) or bool(c["dynamic"])
            if c["material"] == MATERIAL_FLUID and g_upper is not None:
                # emitter placeholders (above g_upper) produce no pair sums
                out_mask[cur:cur + m] = c["pos"][:, 1] <= g_upper
            else:
                out_mask[cur:cur + m] = produces
            cur += m
        S, S_big = estimate_slab_sizes(np.concatenate([all_pos, pad]), act,
                                       params, output_mask=out_mask,
                                       round_to=64)
        from .ops.pair_dma import estimate_su
        # margin 3.5 (was 2.2): the estimate runs on the INITIAL state, and
        # post-collapse geometry demands far more — the settled 1.23M
        # headline checkpoint measured 19456 lanes vs the initial-state
        # estimate's 6284 (3.1x; the compact column becomes a wide shallow
        # pool whose superblocks mix fluid, surface and walls). The shipped
        # 2.2 margin truncated 54-88k candidates in burst steps at deep
        # settle (bench_r5h/r5i logs). SU is a VMEM reservation, not a DMA
        # cost — superblocks move only their demanded lanes — so the wider
        # budget is ~1-2 MB of VMEM, and the runtime overflow counter still
        # guards whatever even 3.5x does not cover.
        su = estimate_su(np.concatenate([all_pos, pad]), act, params,
                         margin=3.5, output_mask=out_mask)
        params = make_params(n_particles, pair_slab=S, pair_slab_big=S_big,
                             pair_dma_su=su, **kw)

    # ---- pack into the padded state ---------------------------------------
    state = zeros_state(params)
    p: ParticleState = state.particles
    n_pad = params.n_pad

    pos = np.zeros((n_pad, dim), np.float32)
    vel = np.zeros((n_pad, dim), np.float32)
    dens = np.zeros(n_pad, np.float32)
    mat = np.zeros(n_pad, np.int32)
    obj = np.full(n_pad, -1, np.int32)
    dyn = np.zeros(n_pad, np.int32)
    rest_pos = np.zeros((n_pad, dim), np.float32)
    entry_t = np.full(n_pad, -1.0, np.float32)
    entry_m = np.zeros(n_pad, np.int32)

    cursor = 0
    for c in chunks:
        n = c["pos"].shape[0]
        sl = slice(cursor, cursor + n)
        pos[sl] = c["pos"]
        vel[sl] = c["vel"]
        dens[sl] = c["density"]
        obj[sl] = c["obj_id"]
        dyn[sl] = c["dynamic"]
        rest_pos[sl] = c["rest_pos"]
        if c["entry"] > 0.0:
            entry_t[sl] = c["entry"]
            entry_m[sl] = c["material"]
            mat[sl] = MATERIAL_NONE
        else:
            mat[sl] = c["material"]
        cursor += n

    mass = (0.8 * params.particle_diameter ** dim) * dens  # V0 * density
    rest_volume = np.full(n_pad, params.v0, np.float32)

    p = p.replace(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        density=jnp.asarray(dens), mass=jnp.asarray(mass),
        rest_volume=jnp.asarray(rest_volume),
        material=jnp.asarray(mat), object_id=jnp.asarray(obj),
        is_dynamic=jnp.asarray(dyn), rigid_rest_pos=jnp.asarray(rest_pos),
        entry_time=jnp.asarray(entry_t), entry_material=jnp.asarray(entry_m),
    )

    # ---- rigid body table ---------------------------------------------------
    O = params.max_objects
    r_mass = np.zeros(O, np.float32)
    r_com = np.zeros((O, dim), np.float32)
    r_com0 = np.zeros((O, dim), np.float32)
    r_rot = np.tile(np.eye(dim, dtype=np.float32), (O, 1, 1))
    r_vel = np.zeros((O, dim), np.float32)
    r_dyn = np.zeros(O, np.int32)
    r_mat = np.zeros(O, np.int32)
    r_entry = np.full(O, -1.0, np.float32)
    r_present = np.zeros(O, np.int32)

    for so in scene_objects:
        oid = so.object_id
        r_mat[oid] = so.material
        r_present[oid] = 1 if so.entry_time <= 0.0 else 0
        r_entry[oid] = so.entry_time
        if oid in rigid_meta:
            m = rigid_meta[oid]
            r_dyn[oid] = int(m["dynamic"])
            r_mass[oid] = m["mass"]
            if m["dynamic"]:
                r_com0[oid] = 0.0
                r_com[oid] = m["translation"]
                r_rot[oid] = m["rot"].astype(np.float32)
                r_vel[oid] = m["vel"]

    rigid = RigidState(
        mass=jnp.asarray(r_mass), com=jnp.asarray(r_com), com0=jnp.asarray(r_com0),
        rot=jnp.asarray(r_rot), vel=jnp.asarray(r_vel),
        omega=state.rigid.omega, force=state.rigid.force, torque=state.rigid.torque,
        is_dynamic=jnp.asarray(r_dyn), obj_material=jnp.asarray(r_mat),
        entry_time=jnp.asarray(r_entry), present=jnp.asarray(r_present),
    )

    state = state.replace(particles=p, rigid=rigid)
    # Configuration-level invisibleObjects list: the reference driver skips
    # these ids when drawing (run_simulation.py:88); here it folds into the
    # per-object visible flag every export/render backend already honors
    for oid in (cfg.get_cfg("invisibleObjects") or []):
        for so in scene_objects:
            if so.object_id == oid:
                so.visible = False
    scene = Scene(params=params, config=cfg, objects=scene_objects,
                  fluid_object_ids=fluid_ids, rigid_object_ids=rigid_ids)
    return scene, state
