"""Rigid-path tests: Akinci volumes, coupling wrench momentum balance, the
JAX rigid integrator (wall rest, two-body DEM collision), a small coupling
scene, and the shape-matching backend.

Covers the physics the reference validates only by eyeballing demos
(SPH/fluid_solvers/base_solver.py:105-187, SPH/rigid_solver/bullet_solver.py
in jason-huang03/SPH_Project).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sph_project_tpu.utils.config import SimConfig
from sph_project_tpu.scene import load_scene
from sph_project_tpu import sim as simlib
from sph_project_tpu.solvers import common
from sph_project_tpu.ops import kernels
from sph_project_tpu.ops.pairs import slab_pack


def write_cube_obj(path, size=0.1):
    """Axis-aligned cube mesh centered at the origin (quads; the OBJ loader
    fan-triangulates)."""
    s = size / 2.0
    verts = [(x, y, z) for x in (-s, s) for y in (-s, s) for z in (-s, s)]
    quads = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2),
             (3, 4, 8, 7), (1, 3, 7, 5), (2, 6, 8, 4)]
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for q in quads:
            f.write("f " + " ".join(str(i) for i in q) + "\n")
    return path


@pytest.fixture(scope="module")
def cube_obj(tmp_path_factory):
    return write_cube_obj(str(tmp_path_factory.mktemp("mesh") / "cube.obj"))


def rigid_body(oid, geom, translation, *, dynamic=True, density=500.0,
               vel=(0, 0, 0)):
    return {"objectId": oid, "geometryFile": geom,
            "translation": list(translation), "rotationAxis": [0, 1, 0],
            "rotationAngle": 0.0, "scale": [1, 1, 1], "velocity": list(vel),
            "density": density, "color": [255, 255, 255],
            "isDynamic": dynamic, "entryTime": -1.0}


def base_cfg(method="wcsph", dt=1e-3, gravity=(0, -9.81, 0), extra=None):
    conf = {"domainStart": [0, 0, 0], "domainEnd": [0.6, 0.6, 0.6],
            "addDomainBox": False, "particleRadius": 0.01,
            "density0": 1000, "gravitation": list(gravity),
            "simulationMethod": method, "viscosityMethod": "standard",
            "timeStepSize": dt, "viscosity": 0.05}
    if extra:
        conf.update(extra)
    return conf


def fluid_block(oid, start, end, vel=(0, 0, 0)):
    return {"objectId": oid, "start": list(start), "end": list(end),
            "translation": [0, 0, 0], "scale": [1, 1, 1],
            "velocity": list(vel), "density": 1000.0,
            "color": [50, 100, 200], "entryTime": -1.0}


def test_akinci_volume_matches_bruteforce(cube_obj):
    """V_b = 1/(W(0) + sum same-object W) — the fixed-K prepare-time path vs
    a dense numpy evaluation (base_solver.py:105-123)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(),
        "RigidBodies": [rigid_body(0, cube_obj, (0.3, 0.3, 0.3))]})
    scene, state = load_scene(config=cfg)
    params = scene.params
    sim = simlib.Simulation(scene, state)
    p = sim.state.particles
    pos = np.asarray(p.pos)
    mat = np.asarray(p.material)
    obj = np.asarray(p.object_id)
    vol = np.asarray(p.rest_volume)
    rig = np.nonzero(mat == 2)[0]
    assert rig.size > 20
    h = params.support_radius
    W0 = float(kernels.W0(h, params.dim, params.kernel_type))
    for i in rig[:: max(rig.size // 10, 1)]:
        d = np.linalg.norm(pos - pos[i], axis=1)
        nb = (d < h) & (obj == obj[i]) & (np.arange(len(d)) != i) & (mat != 0)
        Ws = np.asarray(kernels.W(jnp.asarray(d[nb]), h, params.dim,
                                  params.kernel_type))
        expect = 1.0 / (W0 + Ws.sum())
        np.testing.assert_allclose(vol[i], expect, rtol=2e-4)


def test_pressure_wrench_balances_momentum(cube_obj):
    """Fluid<->rigid pressure coupling is equal-and-opposite: the net fluid
    momentum change plus the rigid body force sums to ~zero
    (base_solver.py:135-187)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(),
        "RigidBodies": [rigid_body(0, cube_obj, (0.3, 0.22, 0.3))],
        "FluidBlocks": [fluid_block(1, (0.2, 0.05, 0.2), (0.4, 0.2, 0.4))]})
    scene, state = load_scene(config=cfg)
    params = scene.params
    sim = simlib.Simulation(scene, state)
    state = sim.state
    state, env = simlib.Plumbing.neighbor_prep(state, params)
    p = state.particles
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    p = p.replace(density=common.compute_density(p, env, sl, params))
    sl["density"] = slab_pack(env, {"d": p.density})["d"]
    # uniform positive pressure on fluid
    pres = jnp.where(p.material == 1, 500.0, 0.0)
    p = p.replace(pressure=pres)
    sl["pressure"] = slab_pack(env, {"pr": pres})["pr"]
    acc, rf, rt = common.pressure_acceleration(p, state.rigid, env, sl, params)
    m = np.asarray(p.mass)
    a = np.asarray(acc)
    fluid_mom = (m[:, None] * a).sum(axis=0)
    rigid_force = np.asarray(rf).sum(axis=0)
    scale = np.abs(m[:, None] * a).sum() + 1e-12
    np.testing.assert_allclose(fluid_mom + rigid_force, 0.0,
                               atol=2e-5 * scale)


@pytest.mark.slow
def test_rigid_box_falls_and_rests(cube_obj):
    """A dynamic box dropped in vacuum lands on the inset wall and stops
    (the Bullet-wall behavior, bullet_solver.py:53-75)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(dt=2e-3),
        "RigidBodies": [rigid_body(0, cube_obj, (0.3, 0.22, 0.3))]})
    scene, state = load_scene(config=cfg)
    sim = simlib.Simulation(scene, state)
    for _ in range(120):
        sim.step()
    rigid = sim.state.rigid
    com = np.asarray(rigid.com[0])
    vel = np.asarray(rigid.vel[0])
    assert np.isfinite(com).all() and np.isfinite(np.asarray(rigid.rot[0])).all()
    assert np.linalg.norm(vel) < 0.05, f"box still moving: {vel}"
    # resting height: wall inset + half cube (0.05); allow a particle diameter
    eps = scene.params.padding + scene.params.particle_diameter
    assert abs(com[1] - (eps + 0.05)) < 2.5 * scene.params.particle_diameter


def test_two_box_collision_conserves_momentum(cube_obj):
    """DEM rigid-rigid contact: a moving box hits a resting one in zero
    gravity; total linear momentum is preserved (the stand-in for Bullet's
    contact solver, rigid/integrator.py:47-88)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(dt=1e-3, gravity=(0, 0, 0)),
        "RigidBodies": [
            rigid_body(0, cube_obj, (0.24, 0.3, 0.3), vel=(1.0, 0, 0)),
            rigid_body(1, cube_obj, (0.37, 0.3, 0.3)),
        ]})
    scene, state = load_scene(config=cfg)
    sim = simlib.Simulation(scene, state)
    rigid = sim.state.rigid
    m = np.asarray(rigid.mass[:2])
    p0 = (m[:, None] * np.asarray(rigid.vel[:2])).sum(axis=0)
    for _ in range(45):   # impact at ~step 30 (0.03 m gap at 1 m/s, dt 1e-3)
        sim.step()
    rigid = sim.state.rigid
    v = np.asarray(rigid.vel[:2])
    p1 = (m[:, None] * v).sum(axis=0)
    assert np.isfinite(v).all()
    # box 1 must have been set in motion by the impact
    assert np.linalg.norm(v[1]) > 0.05
    np.testing.assert_allclose(p1, p0, atol=0.08 * np.linalg.norm(p0) + 1e-8)


def test_three_body_squeeze_momentum(cube_obj):
    """Simultaneous multi-body contact: two outer boxes close on a middle box
    at once, so middle-box particles touch body 0 AND body 2 in the same step
    — exactly the case the round-2 weighted-mean body id aliased to body 1
    (the middle box itself). With exact per-body channels
    (rigid/integrator.py rigid_contact_data) momentum is conserved and the
    middle box stays put by symmetry."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(dt=1e-3, gravity=(0, 0, 0)),
        "RigidBodies": [
            rigid_body(0, cube_obj, (0.17, 0.3, 0.3), vel=(0.8, 0, 0)),
            rigid_body(1, cube_obj, (0.30, 0.3, 0.3)),
            rigid_body(2, cube_obj, (0.43, 0.3, 0.3), vel=(-0.8, 0, 0)),
        ]})
    scene, state = load_scene(config=cfg)
    assert scene.params.contact_channels == (0, 1, 2)
    sim = simlib.Simulation(scene, state)
    rigid = sim.state.rigid
    m = np.asarray(rigid.mass[:3])
    p0 = (m[:, None] * np.asarray(rigid.vel[:3])).sum(axis=0)   # ~0 by symmetry
    for _ in range(60):      # gaps are 0.03 m at 0.8 m/s: impact ~step 38
        sim.step()
    rigid = sim.state.rigid
    v = np.asarray(rigid.vel[:3])
    com = np.asarray(rigid.com[:3])
    assert np.isfinite(v).all() and np.isfinite(com).all()
    p1 = (m[:, None] * v).sum(axis=0)
    scale = float(np.abs(m[:, None] * v).sum()) + float(np.abs(m).sum()) * 0.8
    np.testing.assert_allclose(p1, p0, atol=0.05 * scale)
    # the middle box was hit from both sides at once: it must not have been
    # launched (the aliasing bug sent both impulses into it)
    assert abs(v[1, 0]) < 0.25, f"middle box launched: {v[1]}"
    assert abs(com[1, 0] - 0.30) < 0.02, f"middle box displaced: {com[1]}"
    # the outer boxes must actually have collided (not passed through)
    assert v[0, 0] < 0.5 and v[2, 0] > -0.5
    assert com[0, 0] < com[1, 0] < com[2, 0]


@pytest.mark.slow
def test_three_box_stack_settles(cube_obj):
    """A 3-box tower dropped under gravity settles into a stack: distinct
    resting heights, low velocities, no interpenetration blow-up — the
    final_scene1 pileup class (9 rigids on the floor) at test scale."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(dt=2e-3),
        "RigidBodies": [
            rigid_body(0, cube_obj, (0.3, 0.12, 0.3), density=800.0),
            rigid_body(1, cube_obj, (0.3, 0.24, 0.3), density=800.0),
            rigid_body(2, cube_obj, (0.3, 0.36, 0.3), density=800.0),
        ]})
    scene, state = load_scene(config=cfg)
    sim = simlib.Simulation(scene, state)
    for _ in range(250):
        sim.step()
    rigid = sim.state.rigid
    com = np.asarray(rigid.com[:3])
    v = np.asarray(rigid.vel[:3])
    assert np.isfinite(com).all() and np.isfinite(v).all()
    assert (np.linalg.norm(v, axis=1) < 0.12).all(), f"stack still moving: {v}"
    ys = com[:, 1]
    assert ys[0] < ys[1] < ys[2], f"stack order lost: {ys}"
    d = scene.params.particle_diameter
    gaps = np.diff(ys)
    # each gap ~ cube size (0.1); tolerate contact penetration / separation
    assert (gaps > 0.1 - 3 * d).all() and (gaps < 0.1 + 3 * d).all(), gaps


@pytest.mark.slow
def test_rigid_rigid_friction_decelerates_slider(cube_obj):
    """Coulomb contact friction (rigid/integrator.py resolve_body_contacts):
    a cube sliding across a STATIC platform body (not the wall clamp)
    decelerates; with mu=0 it keeps most of its speed."""
    def run(mu):
        platform = rigid_body(0, cube_obj, (0.3, 0.1, 0.3), dynamic=False)
        platform["scale"] = [4.0, 0.5, 2.0]
        cfg = SimConfig(config={
            "Configuration": base_cfg(dt=1e-3),
            "RigidBodies": [
                platform,
                rigid_body(1, cube_obj, (0.12, 0.178, 0.3), vel=(0.7, 0, 0)),
            ]})
        scene, state = load_scene(
            config=cfg, contact_friction=mu, wall_friction=0.0)
        sim = simlib.Simulation(scene, state)
        # landing at ~step 65; stop at 120 — before the slider can coast off
        # the platform edge and hit the domain-wall clamp
        for _ in range(120):
            sim.step()
        return float(np.asarray(sim.state.rigid.vel[1, 0]))

    v_mu = run(0.5)
    v_free = run(0.0)
    assert np.isfinite(v_mu) and np.isfinite(v_free)
    # the landing impact itself costs some vx (single aggregated contact
    # normal tilts against motion); steady sliding afterwards is lossless
    assert v_free > 0.2, f"frictionless slider lost speed anyway: {v_free}"
    assert v_mu < 0.25 * v_free, f"friction ineffective: {v_mu} vs {v_free}"


@pytest.mark.slow
def test_coupling_scene_runs_bounded(cube_obj):
    """1 fluid block + 2 dynamic rigids under DFSPH stays finite and inside
    the domain (the final_scene1 workload class at test scale)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(method="dfsph", dt=1e-3),
        "RigidBodies": [
            rigid_body(0, cube_obj, (0.22, 0.3, 0.3), density=400.0),
            rigid_body(1, cube_obj, (0.4, 0.34, 0.3), density=1500.0),
        ],
        "FluidBlocks": [fluid_block(2, (0.15, 0.05, 0.15), (0.45, 0.15, 0.45))]})
    scene, state = load_scene(config=cfg)
    sim = simlib.Simulation(scene, state)
    diag = None
    for _ in range(25):
        diag = sim.step()
    p = sim.state.particles
    pos = np.asarray(p.pos)
    act = np.asarray(p.material) != 0
    assert np.isfinite(pos[act]).all()
    assert float(diag["density_max"]) < 1400.0
    com = np.asarray(sim.state.rigid.com[:2])
    assert (com > 0).all() and (com < 0.6).all(), f"rigid escaped: {com}"


@pytest.mark.slow
def test_shape_matching_backend_stays_rigid(cube_obj):
    """rigidSolver=shape_matching: a falling box lands and its particle cloud
    stays rigid (pairwise extent preserved) — the alternative backend the
    reference ships as dead code (shape_matching_solver.py)."""
    cfg = SimConfig(config={
        "Configuration": base_cfg(dt=2e-3, extra={"rigidSolver": "shape_matching"}),
        "RigidBodies": [rigid_body(0, cube_obj, (0.3, 0.25, 0.3))]})
    scene, state = load_scene(config=cfg)
    assert scene.params.rigid_solver == "shape_matching"
    sim = simlib.Simulation(scene, state)

    def shape_stats():
        # rotation-invariant rigidity measures (the body may tumble, and the
        # state arrays are re-sorted each step, so use distances from COM)
        p = sim.state.particles
        sel = np.asarray(p.material) == 2
        pos = np.asarray(p.pos)[sel]
        r = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        return np.array([r.max(), r.mean()])

    e0 = shape_stats()
    for _ in range(120):
        sim.step()
    e1 = shape_stats()
    np.testing.assert_allclose(e1, e0, rtol=0.05)
    com = np.asarray(sim.state.rigid.com[0])
    assert np.isfinite(com).all()
    assert com[1] < 0.2, "box never fell"
    vel = np.asarray(sim.state.rigid.vel[0])
    assert np.linalg.norm(vel) < 0.2


def test_object_gather_exact_and_reduce_close():
    """object_gather must reproduce table[obj] BITWISE (one nonzero per
    one-hot row; HIGHEST precision reconstructs f32 exactly — the rigid
    pose renewal relies on it), and object_reduce must match segment_sum
    to reduction-reassociation tolerance (solvers/common.py)."""
    import jax
    rng = np.random.RandomState(7)
    N, O = 4096, 32
    obj = jnp.asarray(rng.randint(-1, O, size=N), jnp.int32)
    clip = jnp.clip(obj, 0, O - 1)
    tables = {
        "f": jnp.asarray(rng.randn(O, 3).astype(np.float32) * 1e3),
        "r": jnp.asarray(rng.randn(O, 3, 3).astype(np.float32)),
        "i": jnp.asarray(rng.randint(0, 5, size=(O,)), jnp.int32),
    }
    out = jax.jit(lambda o: common.object_gather(tables, o, O))(clip)
    for k in tables:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(tables[k][clip]))
        assert out[k].dtype == tables[k].dtype

    vals = {"v": jnp.asarray(rng.randn(N, 3).astype(np.float32)),
            "s": jnp.asarray(rng.randn(N).astype(np.float32))}
    sel = obj >= 0
    red = jax.jit(
        lambda o, s: common.object_reduce(vals, o, O, sel=s))(clip, sel)
    seg = jnp.where(sel, clip, O)
    ref_v = np.stack([
        np.asarray(jax.ops.segment_sum(
            jnp.where(sel, vals["v"][:, d], 0.0), seg, num_segments=O + 1))[:O]
        for d in range(3)], axis=-1)
    np.testing.assert_allclose(np.asarray(red["v"]), ref_v,
                               rtol=1e-5, atol=1e-4)
