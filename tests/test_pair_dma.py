"""Parity tests for the kernel-side-DMA pair engine (ops/pair_dma.py).

On CPU the engine runs in Pallas interpret mode, so these stay tiny: the
engine's physics must match (a) an O(N^2) brute force and (b) the chunked-JAX
executor bit-for-bit up to f32 summation order.
"""
import numpy as np
import pytest

import jax

from sph_project_tpu.utils.config import SimConfig
from sph_project_tpu.scene import load_scene
from sph_project_tpu import sim as simlib
from sph_project_tpu.solvers import common

from oracle import Oracle
from test_rigid import write_cube_obj


def dam_cfg(method="wcsph", visc_method="standard", rigid=None):
    conf = {"domainStart": [0, 0, 0], "domainEnd": [0.4, 0.4, 0.4],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": method,
            "viscosityMethod": visc_method, "timeStepSize": 5e-4,
            "viscosity": 0.05}
    scene = {"Configuration": conf,
             "FluidBlocks": [{"objectId": 0, "start": [0.06, 0.05, 0.06],
                              "end": [0.2, 0.19, 0.2],
                              "translation": [0, 0, 0], "scale": [1, 1, 1],
                              "velocity": [0, 0, 0], "density": 1000.0,
                              "color": [50, 100, 200], "entryTime": -1.0}]}
    if rigid:
        scene["RigidBodies"] = [{
            "objectId": 1, "geometryFile": rigid,
            "translation": [0.2, 0.3, 0.2], "rotationAxis": [0, 1, 0],
            "rotationAngle": 0.0, "scale": [1, 1, 1], "velocity": [0, 0, 0],
            "density": 500.0, "color": [255, 255, 255], "isDynamic": True,
            "entryTime": -1.0}]
    return SimConfig(config=scene)


def build(backend, **cfg_kw):
    kw = dict(pair_backend=backend)
    if backend != "pallas_dma":
        kw.update(pair_block=64, pair_chunk=32)
    return load_scene(config=dam_cfg(**cfg_kw), **kw)


def sorted_active_pos(state):
    p = state.particles
    a = np.asarray(p.material) != 0
    res = np.asarray(p.pos)[a]
    return res[np.lexsort(res.T)]


def test_dma_density_matches_bruteforce():
    scene, state = build("pallas_dma")
    params = scene.params
    state, env = simlib.Plumbing.neighbor_prep(state, params)
    assert int(env.overflow) == 0
    p = state.particles
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    dens = np.asarray(common.compute_density(p, env, sl, params))
    pos = np.asarray(p.pos)
    act = np.asarray(p.material) == 1
    orc = Oracle(pos[act], np.zeros_like(pos[act]), h=params.support_radius,
                 dt=params.dt, v0=params.v0)
    R, r, mask = orc._pairs()
    orc.compute_density(R, r, mask)
    np.testing.assert_allclose(dens[act], orc.density, atol=5e-4)


def test_dma_matches_jax_backend_wcsph():
    results = []
    for backend in ["pallas_dma", "jax"]:
        scene, state = build(backend)
        sim = simlib.Simulation(scene, state)
        for _ in range(2):
            diag = sim.step()
        assert float(diag["neighbor_overflow"]) == 0
        results.append(sorted_active_pos(sim.state))
    np.testing.assert_allclose(results[0], results[1], atol=2e-6)


def test_dma_density_matches_bruteforce_spray():
    """Scattered positions with y-gaps exercise the occupied-row window
    enumeration (gap-skipping + even slot distribution for deep hulls)."""
    scene, state = build("pallas_dma")
    params = scene.params
    p = state.particles
    pos = np.asarray(p.pos).copy()
    act = np.asarray(p.material) == 1
    rng = np.random.default_rng(7)
    idx = np.flatnonzero(act)
    sel = rng.choice(idx, size=len(idx) // 2, replace=False)
    lo = np.asarray(params.domain_start) + 0.02
    hi = np.asarray(params.domain_end) - 0.02
    # dilute cloud: half the particles scattered over the whole domain, so
    # half-blocks span many y-rows with gaps between occupied rows
    pos[sel] = rng.uniform(lo, hi, size=(len(sel), 3)).astype(np.float32)
    state = state.replace(particles=p.replace(pos=pos))
    state, env = simlib.Plumbing.neighbor_prep(state, params)
    assert int(env.overflow) == 0
    p = state.particles
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    dens = np.asarray(common.compute_density(p, env, sl, params))
    pos_s = np.asarray(p.pos)
    act_s = np.asarray(p.material) == 1
    orc = Oracle(pos_s[act_s], np.zeros_like(pos_s[act_s]),
                 h=params.support_radius, dt=params.dt, v0=params.v0)
    R, r, mask = orc._pairs()
    orc.compute_density(R, r, mask)
    np.testing.assert_allclose(dens[act_s], orc.density, atol=5e-4)


@pytest.mark.slow
def test_dma_matches_jax_backend_dfsph_rigid(tmp_path):
    cube = write_cube_obj(str(tmp_path / "cube.obj"))
    results = []
    for backend in ["pallas_dma", "jax"]:
        scene, state = build(backend, method="dfsph", rigid=cube)
        sim = simlib.Simulation(scene, state)
        diag = sim.step()
        assert float(diag["neighbor_overflow"]) == 0
        results.append((sorted_active_pos(sim.state),
                        np.asarray(sim.state.rigid.com[1])))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=5e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=5e-5)
