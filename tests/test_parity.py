"""Golden parity: the engine vs a float64 brute-force oracle of the
reference's physics (tests/oracle.py — the reference itself cannot execute
here: taichi is not installed and the environment has no network, so the
oracle implements the reference's cited formulas independently).

These are trajectory-level tests: positions must match the oracle after real
impact dynamics (nearest-neighbor matching, since the engine re-sorts its
state arrays each step), density statistics must track, and DFSPH iteration
counts must agree — the reference's own convergence signal
(/root/reference/SPH/fluid_solvers/DFSPH.py:159,243).
"""
import numpy as np
import pytest

from sph_project_tpu.utils.config import SimConfig
from sph_project_tpu.scene import load_scene
from sph_project_tpu import sim as simlib

from oracle import Oracle


def build(method, dt=5e-4):
    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.4, 0.4, 0.4],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": method,
            "viscosityMethod": "standard", "timeStepSize": dt,
            "viscosity": 0.05},
        "FluidBlocks": [{"objectId": 0, "start": [0.06, 0.042, 0.06],
                         "end": [0.2, 0.2, 0.2], "translation": [0, 0, 0],
                         "scale": [1, 1, 1], "velocity": [0, 0, 0],
                         "density": 1000.0, "color": [50, 100, 200],
                         "entryTime": -1.0}]})
    scene, state = load_scene(config=cfg, pair_block=64, pair_chunk=32)
    sim = simlib.Simulation(scene, state)
    params = scene.params
    p = sim.state.particles
    act = np.asarray(p.material) == 1
    orc = Oracle(np.asarray(p.pos)[act], np.asarray(p.vel)[act],
                 h=params.support_radius, dt=params.dt,
                 rho0=params.density0, v0=params.v0, gravity=params.gravity,
                 viscosity=params.viscosity,
                 surface_tension=params.surface_tension,
                 domain=(params.domain_start, params.domain_end),
                 padding=params.padding,
                 kernel=params.kernel_type)
    return sim, orc


def nn_dist(sim, orc):
    p = sim.state.particles
    act = np.asarray(p.material) == 1
    pe = np.asarray(p.pos)[act]
    # brute-force nearest neighbor (n ~ 500; scipy not required)
    d = np.linalg.norm(orc.pos[:, None, :] - pe[None, :, :], axis=-1)
    return d.min(axis=1)


def engine_density(sim):
    p = sim.state.particles
    act = np.asarray(p.material) == 1
    return np.asarray(p.density)[act]


def test_wcsph_trajectory_matches_oracle():
    sim, orc = build("wcsph")
    for _ in range(100):
        sim.step()
        orc.step_wcsph()
    d = nn_dist(sim, orc)
    # f32 engine vs f64 oracle through impact: observed ~7e-7 at 160 steps;
    # 1e-5 (a thousandth of a particle radius) is a 15x margin
    assert d.max() < 1e-5, f"trajectory drift {d.max():.2e}"
    de = engine_density(sim)
    np.testing.assert_allclose(de.mean(), orc.density.mean(), rtol=1e-4)
    np.testing.assert_allclose(de.max(), orc.density.max(), rtol=1e-3)


def test_dfsph_oracle_parity_quick():
    """Default-tier DFSPH parity: 25 steps reach first floor contact (the
    2 mm gap closes at ~step 20 under gravity), so the correctors do real
    work; iteration counts must track the oracle's every step. The 40-step
    version below (slow tier) extends through full impact dynamics."""
    sim, orc = build("dfsph", dt=1e-3)
    alpha = dens = None
    for s in range(25):
        diag = sim.step()
        alpha, dens, oi, od = orc.step_dfsph(alpha, dens)
        assert abs(int(diag["solver_iters"]) - oi) <= 2, \
            f"step {s}: density-solver iters {int(diag['solver_iters'])} vs {oi}"
        assert abs(int(diag["div_iters"]) - od) <= 2, \
            f"step {s}: divergence iters {int(diag['div_iters'])} vs {od}"
    d = nn_dist(sim, orc)
    assert d.max() < 3e-3, f"trajectory drift {d.max():.2e}"


def test_pcisph_oracle_parity():
    """PCISPH parity: trajectory + prediction-correction iteration counts
    must track the oracle (reference convergence print PCISPH.py:125; loop
    PCISPH.py:110-125; step ordering PCISPH.py:165-185)."""
    sim, orc = build("pcisph", dt=1e-3)
    for s in range(50):
        diag = sim.step()
        oi, _ = orc.step_pcisph()
        assert abs(int(diag["solver_iters"]) - oi) <= 2, \
            f"step {s}: PCISPH iters {int(diag['solver_iters'])} vs {oi}"
    d = nn_dist(sim, orc)
    assert d.max() < 3e-3, f"trajectory drift {d.max():.2e}"
    de = engine_density(sim)
    np.testing.assert_allclose(de.mean(), orc.density.mean(), rtol=2e-3)


def test_iisph_oracle_parity():
    """IISPH parity: trajectory + relaxed-Jacobi iteration counts must track
    the oracle (reference convergence print IISPH.py:200; refine
    IISPH.py:185-200; step ordering IISPH.py:203-228)."""
    sim, orc = build("iisph", dt=1e-3)
    for s in range(50):
        diag = sim.step()
        oi, _ = orc.step_iisph()
        assert abs(int(diag["solver_iters"]) - oi) <= 2, \
            f"step {s}: IISPH iters {int(diag['solver_iters'])} vs {oi}"
    d = nn_dist(sim, orc)
    assert d.max() < 3e-3, f"trajectory drift {d.max():.2e}"
    de = engine_density(sim)
    np.testing.assert_allclose(de.mean(), orc.density.mean(), rtol=2e-3)


def test_pbf_oracle_parity():
    """PBF parity: trajectory + density after the 5-iteration position
    projection (PBF.py:61-65,104-131, step ordering PBF.py:145-158), with the
    reference's s_corr defaults (PBF.py:13-14). PBF publishes no convergence
    error, so the trajectory IS the signal.

    The configuration is the reference's OWN working PBF setup — the 2D
    high_fluid_pbf_2d.json constants (r=1.11, supportRadius=1.12, spacing
    0.88, dt=0.05, zero viscosity); in 3D the reference's 2D-tuned constants
    make PBF explode in the first step (poly6 with no self term reads a rest
    lattice at ~0.65*rho0, the unclamped negative constraint turns the
    projection attractive, velocities blow past 300 m/s — faithfully in both
    engine and oracle, but chaos has no trajectory parity)."""
    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0.0, 0.0], "domainEnd": [40.0, 40.0],
            "addDomainBox": False, "particleRadius": 1.11,
            "supportRadius": 1.12, "particleSpacing": 0.88,
            "density0": 1000, "gravitation": [0.0, -9.81],
            "simulationMethod": "pbf", "viscosityMethod": "standard",
            "viscosity": 0.0, "timeStepSize": 0.05},
        "FluidBlocks": [{"objectId": 1, "start": [10.0, 1.3],
                         "end": [23.0, 5.7], "translation": [0, 0],
                         "scale": [1, 1], "velocity": [0, 0],
                         "density": 1000.0, "color": [50, 100, 200],
                         "entryTime": -1.0}]})
    scene, state = load_scene(config=cfg, pair_block=64, pair_chunk=32)
    sim = simlib.Simulation(scene, state)
    params = scene.params
    p = sim.state.particles
    act = np.asarray(p.material) == 1
    orc = Oracle(np.asarray(p.pos)[act], np.asarray(p.vel)[act],
                 h=params.support_radius, dt=params.dt,
                 rho0=params.density0, v0=params.v0, gravity=params.gravity,
                 viscosity=params.viscosity,
                 surface_tension=params.surface_tension,
                 domain=(params.domain_start, params.domain_end),
                 padding=params.padding, kernel=params.kernel_type,
                 diameter=params.particle_diameter)
    assert orc.kernel == "poly6"
    for _ in range(20):
        sim.step()
        orc.step_pbf(iters=params.pbf_iters, corr_k=params.pbf_corr_k,
                     corr_dq=params.pbf_corr_delta_q)
    # exact-map window: at dt=0.05 the f32-vs-f64 seed difference doubles
    # every step (measured), so trajectory parity is asserted at 20 steps
    # (observed 7e-4 vs the 2.2 particle diameter); beyond that only
    # statistics can agree between float widths
    d = nn_dist(sim, orc)
    assert d.max() < 2e-3, f"trajectory drift {d.max():.2e}"
    np.testing.assert_allclose(engine_density(sim).mean(),
                               orc.density.mean(), rtol=2e-3)
    for _ in range(30):
        sim.step()
        orc.step_pbf(iters=params.pbf_iters, corr_k=params.pbf_corr_k,
                     corr_dq=params.pbf_corr_delta_q)
    # statistical parity at 50 steps: same compression level, both finite
    # (a 75-particle splash's mean density wobbles ~4% between decohered
    # trajectories; a formula error in poly6/lambda shifts it far more)
    assert np.isfinite(np.asarray(sim.state.particles.pos)).all()
    assert np.isfinite(orc.pos).all()
    np.testing.assert_allclose(engine_density(sim).mean(),
                               orc.density.mean(), rtol=5e-2)


@pytest.mark.slow
def test_dfsph_matches_oracle_with_iteration_counts():
    sim, orc = build("dfsph", dt=1e-3)
    alpha = dens = None
    for s in range(40):
        diag = sim.step()
        alpha, dens, oi, od = orc.step_dfsph(alpha, dens)
        assert abs(int(diag["solver_iters"]) - oi) <= 2, \
            f"step {s}: density-solver iters {int(diag['solver_iters'])} vs {oi}"
        assert abs(int(diag["div_iters"]) - od) <= 2, \
            f"step {s}: divergence iters {int(diag['div_iters'])} vs {od}"
    d = nn_dist(sim, orc)
    # DFSPH's correctors exit on a tolerance test, so an f32-vs-f64 rounding
    # flip can add/remove a whole corrector iteration and shift velocities at
    # the solver-tolerance scale; drift stays well under a particle radius
    # (observed 1.3e-3 = r/7.5 after 40 steps of contact dynamics)
    assert d.max() < 3e-3, f"trajectory drift {d.max():.2e}"
    de = engine_density(sim)
    np.testing.assert_allclose(de.mean(), orc.density.mean(), rtol=2e-3)
