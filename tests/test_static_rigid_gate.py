"""has_dynamic_rigid static gate: wall-only scenes skip the dynamic-body
machinery (integration, renewal gathers, wrench outputs, per-step volume
recompute) — all masked no-ops for static geometry — so trajectories must be
IDENTICAL with the gate on or off. Matches the reference behavior where the
same computations run but write nothing (bullet_solver.py only steps dynamic
bodies; base_solver.py:105-123 volumes select moving particles)."""
import dataclasses

import numpy as np
import pytest

from sph_project_tpu import sim as simlib
from sph_project_tpu.scene import load_scene
from sph_project_tpu.utils.config import SimConfig


def _walls_scene(method="dfsph", emitter=False):
    cfg = {
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.4, 0.4, 0.4],
            "addDomainBox": True, "particleRadius": 0.01,
            "density0": 1000, "gravitation": [0.0, -9.81, 0.0],
            "simulationMethod": method, "viscosityMethod": "standard",
            "timeStepSize": 1e-3, "viscosity": 0.05,
        },
        "FluidBlocks": [{
            "objectId": 0, "start": [0.06, 0.06, 0.06],
            "end": [0.22, 0.22, 0.22], "translation": [0, 0, 0],
            "scale": [1, 1, 1], "velocity": [0, 0, 0], "density": 1000.0,
            "color": [0, 0, 0], "entryTime": -1.0}],
    }
    if emitter:
        cfg["Configuration"]["gravitationUpper"] = 0.3
    return SimConfig(config=cfg)


@pytest.mark.parametrize("method,emitter", [
    ("dfsph", False),
    pytest.param("wcsph", True, marks=pytest.mark.slow),
])
def test_static_rigid_gate_is_exact(method, emitter):
    def run(force_dynamic):
        scene, state = load_scene(config=_walls_scene(method, emitter))
        if force_dynamic:
            scene.params = dataclasses.replace(scene.params,
                                               has_dynamic_rigid=True)
        else:
            # the scene builder must have detected walls-only
            assert scene.params.has_rigid
            assert not scene.params.has_dynamic_rigid
        sim = simlib.Simulation(scene, state)
        for _ in range(5):
            diag = sim.step()
        assert int(diag["neighbor_overflow"]) == 0
        p = sim.state.particles
        return (np.asarray(p.pos), np.asarray(p.vel),
                np.asarray(p.density), np.asarray(p.rest_volume),
                np.asarray(p.mass))

    gated = run(False)
    full = run(True)
    for a, b, name in zip(gated, full,
                          ("pos", "vel", "density", "rest_volume", "mass")):
        np.testing.assert_array_equal(a, b, err_msg=name)
