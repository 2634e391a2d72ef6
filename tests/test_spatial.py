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


@pytest.mark.parametrize("method", [
    # wcsph exercises nothing dfsph's two-segment path doesn't; slow tier
    pytest.param("wcsph", marks=pytest.mark.slow), "dfsph"])
def test_spatial_matches_single_device(method):
    steps = 3
    cfg = dam_cfg(method)

    scene, state = load_scene(config=cfg, pair_block=64, pair_chunk=32)
    sim = simlib.Simulation(scene, state)
    for _ in range(steps):
        diag1 = sim.step()
    r1 = sorted_fluid_pos(sim.state)

    scene2, state2 = load_scene(config=cfg, pair_block=64, pair_chunk=32)
    mesh = spatial.make_mesh(8)
    state2 = jax.jit(lambda s: simlib.prepare(s, scene2.params))(state2)
    state2 = state2.replace(cached_neighbors=None)
    state2 = spatial.shard_state(state2, mesh, scene2.params)
    step = spatial.spatial_step_fn(scene2.params, mesh, state2)
    for _ in range(steps):
        state2, diag2 = step(state2)
    r2 = sorted_fluid_pos(state2)

    assert r1.shape == r2.shape
    np.testing.assert_array_equal(r1, r2)
    assert float(diag2["neighbor_overflow"]) == 0
    if method == "dfsph":
        assert int(diag1["div_iters"]) == int(diag2["div_iters"])
