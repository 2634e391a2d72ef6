"""Spatial domain decomposition (parallel/spatial.py) vs single device.

Runs on the 8-device virtual CPU mesh (conftest). The spatially-decomposed
step — halo exchange via ppermute, local window envs, psum'd residuals —
must reproduce the single-device trajectory exactly: each particle's pair
sums run over identical windows in identical order, so even f32 summation
matches bit for bit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sph_project_tpu.utils.config import SimConfig
from sph_project_tpu.scene import load_scene
from sph_project_tpu import sim as simlib
from sph_project_tpu.parallel import spatial


def dam_cfg(method):
    return SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.6, 0.5, 0.5],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": method,
            "viscosityMethod": "standard", "timeStepSize": 5e-4,
            "viscosity": 0.05},
        "FluidBlocks": [{"objectId": 0, "start": [0.05, 0.045, 0.05],
                         "end": [0.5, 0.25, 0.4], "translation": [0, 0, 0],
                         "scale": [1, 1, 1], "velocity": [0, 0, 0],
                         "density": 1000.0, "color": [50, 100, 200],
                         "entryTime": -1.0}]})


def sorted_fluid_pos(state):
    p = state.particles
    a = np.asarray(p.material) != 0
    r = np.asarray(p.pos)[a]
    return r[np.lexsort(r.T)]


def run_both(cfg, steps=3, **overrides):
    """Run `steps` on one device and on the 8-device mesh; return
    (single diag, spatial diag, single state, spatial state)."""
    scene, state = load_scene(config=cfg, **overrides)
    sim = simlib.Simulation(scene, state)
    for _ in range(steps):
        diag1 = sim.step()

    scene2, state2 = load_scene(config=cfg, **overrides)
    mesh = spatial.make_mesh(8)
    state2 = jax.jit(lambda s: simlib.prepare(s, scene2.params))(state2)
    state2 = state2.replace(cached_neighbors=None)
    state2 = spatial.shard_state(state2, mesh, scene2.params)
    step = spatial.spatial_step_fn(scene2.params, mesh, state2)
    for _ in range(steps):
        state2, diag2 = step(state2)
    return diag1, diag2, sim.state, state2


@pytest.mark.parametrize("method", [
    # wcsph exercises nothing dfsph's two-segment path doesn't; slow tier
    pytest.param("wcsph", marks=pytest.mark.slow), "dfsph"])
def test_spatial_matches_single_device(method):
    diag1, diag2, s1, s2 = run_both(dam_cfg(method),
                                    pair_block=64, pair_chunk=32)
    r1, r2 = sorted_fluid_pos(s1), sorted_fluid_pos(s2)
    assert r1.shape == r2.shape
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0
    if method == "dfsph":
        assert int(diag1["div_iters"]) == int(diag2["div_iters"])


def test_spatial_warm_start_matches_single_device():
    """dfsph_warm_start under spatial decomposition: the kappa carry is a
    per-particle extra that must ride the global resort and the shard_map
    segments exactly like the other carries — bit-identical trajectories."""
    cfg = dam_cfg("dfsph")
    cfg.config["Configuration"]["dfsphWarmStart"] = True
    diag1, diag2, s1, s2 = run_both(cfg, pair_block=64, pair_chunk=32)
    r1, r2 = sorted_fluid_pos(s1), sorted_fluid_pos(s2)
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0
    assert int(diag1["solver_iters"]) == int(diag2["solver_iters"])


def test_spatial_adaptive_warm_matches_single_device():
    """dfsph_warm_factor_hi under spatial decomposition: the rho_max gate is
    a global pmax inside the sharded step (dfsph.warm_factor) — every device
    must see the same scalar, so trajectories stay bit-identical to the
    single-device run and the iteration counts agree."""
    cfg = dam_cfg("dfsph")
    cfg.config["Configuration"]["dfsphWarmStart"] = True
    cfg.config["Configuration"]["dfsphWarmFactorHi"] = 1.0
    diag1, diag2, s1, s2 = run_both(cfg, pair_block=64, pair_chunk=32)
    r1, r2 = sorted_fluid_pos(s1), sorted_fluid_pos(s2)
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0
    assert int(diag1["solver_iters"]) == int(diag2["solver_iters"])


def test_spatial_warm_div_matches_single_device():
    """dfsph_warm_start_div under spatial decomposition: the kappa_v carry
    must ride the global resort and the shard_map segments exactly like
    dfsph_kappa — bit-identical trajectories."""
    cfg = dam_cfg("dfsph")
    cfg.config["Configuration"]["dfsphWarmStart"] = True
    cfg.config["Configuration"]["dfsphWarmStartDiv"] = True
    diag1, diag2, s1, s2 = run_both(cfg, pair_block=64, pair_chunk=32)
    r1, r2 = sorted_fluid_pos(s1), sorted_fluid_pos(s2)
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0
    assert int(diag1["div_iters"]) == int(diag2["div_iters"])


def test_spatial_rigid_coupling_matches(tmp_path):
    """Rigid bodies under spatial decomposition: the psum'd Akinci wrenches,
    contact tables, and body extents (rigid/integrator.py) must make the
    replicated rigid state advance identically on every device — fluid AND
    rigid trajectories match the single-device run bit for bit."""
    from test_rigid import write_cube_obj
    cube = write_cube_obj(str(tmp_path / "cube.obj"), size=0.08)
    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.6, 0.5, 0.5],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": "dfsph",
            "viscosityMethod": "standard", "timeStepSize": 5e-4,
            "viscosity": 0.05},
        "RigidBodies": [
            {"objectId": 1, "geometryFile": cube,
             "translation": [0.3, 0.16, 0.25], "rotationAxis": [0, 1, 0],
             "rotationAngle": 0.0, "scale": [1, 1, 1],
             "velocity": [0, -0.2, 0], "density": 400.0,
             "color": [255, 255, 255], "isDynamic": True, "entryTime": -1.0}],
        "FluidBlocks": [{"objectId": 0, "start": [0.05, 0.045, 0.05],
                         "end": [0.5, 0.12, 0.4], "translation": [0, 0, 0],
                         "scale": [1, 1, 1], "velocity": [0, 0, 0],
                         "density": 1000.0, "color": [50, 100, 200],
                         "entryTime": -1.0}]})
    diag1, diag2, s1, s2 = run_both(cfg, steps=3,
                                    pair_block=64, pair_chunk=32)
    np.testing.assert_array_equal(sorted_fluid_pos(s1), sorted_fluid_pos(s2))
    np.testing.assert_array_equal(np.asarray(s1.rigid.com),
                                  np.asarray(s2.rigid.com))
    # the wrench reduction order differs (per-device partials + tree psum vs
    # one segment_sum), so velocities match to f32 ulp, not bit-for-bit
    np.testing.assert_allclose(np.asarray(s1.rigid.vel),
                               np.asarray(s2.rigid.vel), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.rigid.omega),
                               np.asarray(s2.rigid.omega), atol=1e-6)
    assert float(diag2["neighbor_overflow"]) == 0


@pytest.mark.slow
def test_spatial_contact_env_two_bodies_matches(tmp_path):
    """The contact-producer env under spmd (SpatialPlumbing builds it over
    the halo-extended layout; VERDICT r4 weak #5): two dynamic bodies give
    two contact channels whose tables cross shards. Uses the pallas_dma
    engine (interpret mode on CPU) — the only backend that builds a
    contact_env — and must match the single-device pallas_dma run."""
    from test_rigid import write_cube_obj
    cube = write_cube_obj(str(tmp_path / "cube.obj"), size=0.08)
    body = {"geometryFile": cube, "rotationAxis": [0, 1, 0],
            "rotationAngle": 0.0, "scale": [1, 1, 1],
            "density": 400.0, "color": [255, 255, 255],
            "isDynamic": True, "entryTime": -1.0}
    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.6, 0.5, 0.5],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": "dfsph",
            "viscosityMethod": "standard", "timeStepSize": 5e-4,
            "viscosity": 0.05},
        "RigidBodies": [
            dict(body, objectId=1, translation=[0.2, 0.14, 0.25],
                 velocity=[0, -0.3, 0]),
            dict(body, objectId=2, translation=[0.4, 0.16, 0.25],
                 velocity=[-0.1, -0.3, 0]),
        ],
        "FluidBlocks": [{"objectId": 0, "start": [0.05, 0.045, 0.05],
                         "end": [0.5, 0.1, 0.4], "translation": [0, 0, 0],
                         "scale": [1, 1, 1], "velocity": [0, 0, 0],
                         "density": 1000.0, "color": [50, 100, 200],
                         "entryTime": -1.0}]})
    # sanity: this scene really has two contact channels, and the spatial
    # env exposes a contact-producer env (not the full-scan fallback).
    # pair_dma_group=2 keeps the superblock (64*G) dividing every 8-way
    # local shard (n_pad is rounded to 1024)
    dma_kw = dict(pair_backend="pallas_dma", pair_dma_group=2)
    scene, state = load_scene(config=cfg, **dma_kw)
    assert len(scene.params.contact_channels) == 2
    import dataclasses
    params_sp = dataclasses.replace(scene.params, spmd_axis=spatial.AXIS)
    mesh = spatial.make_mesh(8)
    state_p = jax.jit(lambda s: simlib.prepare(s, scene.params))(state)
    state_p = spatial.shard_state(
        state_p.replace(cached_neighbors=None), mesh, scene.params)

    def probe(s):
        s, cells, _, _ = simlib.sort_state(s, params_sp)
        s = s.replace(cached_neighbors=cells)
        _, env = spatial.SpatialPlumbing.neighbor_prep(s, params_sp)
        return jnp.int32(0 if env.contact_env is None else 1)

    from jax.sharding import PartitionSpec as P
    specs = spatial._state_specs(state_p, scene.params.n_pad)
    got = jax.jit(jax.shard_map(
        probe, mesh=mesh, in_specs=(specs,), out_specs=P(),
        check_vma=False))(state_p)
    assert int(got) == 1, "spatial path did not build the contact env"

    diag1, diag2, s1, s2 = run_both(cfg, steps=3, **dma_kw)
    np.testing.assert_array_equal(sorted_fluid_pos(s1), sorted_fluid_pos(s2))
    np.testing.assert_array_equal(np.asarray(s1.rigid.com),
                                  np.asarray(s2.rigid.com))
    np.testing.assert_allclose(np.asarray(s1.rigid.vel),
                               np.asarray(s2.rigid.vel), atol=1e-6)
    assert float(diag2["neighbor_overflow"]) == 0


@pytest.mark.slow
def test_spatial_deferred_entry_matches():
    """entryTime-gated objects activate mid-run inside shard_map (the
    activation flips materials, which changes the sort and the active sets
    device-locally); trajectories must still match bit for bit."""
    cfg = dam_cfg("wcsph")
    cfg.config["FluidBlocks"].append({
        "objectId": 1, "start": [0.1, 0.3, 0.1], "end": [0.2, 0.4, 0.2],
        "translation": [0, 0, 0], "scale": [1, 1, 1],
        "velocity": [0, -0.5, 0], "density": 1000.0,
        "color": [200, 50, 50], "entryTime": 0.001})   # enters at step 3
    diag1, diag2, s1, s2 = run_both(cfg, steps=5,
                                    pair_block=64, pair_chunk=32)
    r1, r2 = sorted_fluid_pos(s1), sorted_fluid_pos(s2)
    assert r1.shape == r2.shape          # both runs activated the block
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0


@pytest.mark.slow
def test_spatial_implicit_viscosity_matches():
    """Matrix-free CG viscosity inside shard_map: the CG dot products cross
    shards as psums (solvers/viscosity_cg.py); iteration counts and the
    resulting trajectory must match the single-device run."""
    cfg = dam_cfg("dfsph")
    cfg.config["Configuration"]["viscosityMethod"] = "implicit"
    cfg.config["Configuration"]["viscosity"] = 50.0
    cfg.config["Configuration"]["viscosity_b"] = 10.0
    diag1, diag2, s1, s2 = run_both(cfg, steps=3,
                                    pair_block=64, pair_chunk=32)
    np.testing.assert_array_equal(sorted_fluid_pos(s1), sorted_fluid_pos(s2))
    assert float(diag2["neighbor_overflow"]) == 0
    if "cg_iters" in diag1:
        assert int(diag1["cg_iters"]) == int(diag2["cg_iters"])
