"""Physics-invariant tests for the solver family (the test strategy the
reference lacks — SURVEY.md §4): rest-lattice density, dam-break settling
within solver tolerances, boundary clamping, mass conservation, and
method-specific telemetry.

Speed notes: each method's dam break runs ONCE per session (module-scope
cache) and multiple tests assert on the cached result; scenes use
pair_block=64 so the dense pair engine sizes its windows for the tiny
particle counts instead of the production defaults.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_project_tpu.utils.config import SimConfig
from sph_project_tpu.scene import load_scene
from sph_project_tpu import sim as simlib

# pair-engine overrides that fit ~1k-particle test scenes (production
# defaults size blocks/windows for 100k+)
FAST = dict(pair_block=64, pair_chunk=32)


def dam_break_cfg(method, dim=3, dt=1e-3, visc=0.05, visc_method="standard",
                  extra=None):
    conf = {
        "domainStart": [0.0] * dim, "domainEnd": [0.5] * dim,
        "addDomainBox": False, "particleRadius": 0.01,
        "density0": 1000, "gravitation": [0, -9.81, 0][:dim] if dim == 3 else [0, -9.81],
        "simulationMethod": method, "viscosityMethod": visc_method,
        "timeStepSize": dt, "viscosity": visc,
    }
    if extra:
        conf.update(extra)
    blk = {"objectId": 0, "start": [0.05, 0.045, 0.05][:dim],
           "end": [0.3, 0.2, 0.3][:dim],
           "translation": [0] * dim, "scale": [1] * dim, "velocity": [0] * dim,
           "density": 1000.0, "color": [50, 100, 200], "entryTime": -1.0}
    return SimConfig(config={"Configuration": conf, "FluidBlocks": [blk]})


def run_steps(cfg, n, **overrides):
    scene, state = load_scene(config=cfg, **dict(FAST, **overrides))
    sim = simlib.Simulation(scene, state)
    diag = None
    for _ in range(n):
        diag = sim.step()
    return scene, sim.state, {k: float(v) for k, v in diag.items()}


_RUNS = {}


def settled(method, dt=5e-4, steps=40):
    key = (method, dt, steps)
    if key not in _RUNS:
        # 3D PBF runs the shipped pbf_3d parameterization: s_corr off (the
        # reference constants are 2D-tuned and disperse 3D water; see
        # params.pbf_corr_k note)
        extra = {"pbfCorrK": 0.0} if method == "pbf" else None
        _RUNS[key] = run_steps(dam_break_cfg(method, dt=dt, extra=extra),
                               steps)
    return _RUNS[key]


@pytest.mark.parametrize("method", [
    "wcsph", "dfsph", "pcisph", "pbf",
    # IISPH compiles the slowest relaxed-Jacobi loop; covered in the slow tier
    pytest.param("iisph", marks=pytest.mark.slow)])
def test_dam_break_settles(method):
    scene, state, diag = settled(method)
    p = state.particles
    pos = np.asarray(p.pos)
    f = np.asarray(p.material) == 1
    assert np.isfinite(pos[f]).all(), f"{method}: NaN positions"
    # particles stay inside the padded domain
    pad = scene.params.padding
    assert pos[f].min() >= pad - 1e-5
    assert pos[f].max() <= 0.5 - pad + 1e-5
    # density never runs away (solvers keep compression bounded)
    assert diag["density_max"] < 1150.0, f"{method}: density {diag['density_max']}"
    assert diag["neighbor_overflow"] == 0
    # the sort-vs-window overflow split is present and clean
    assert diag["sort_overflow"] == 0


def test_mass_conservation_and_determinism():
    cfg = dam_break_cfg("wcsph", dt=5e-4)
    scene, state, _ = run_steps(cfg, 15)
    p = state.particles
    f = np.asarray(p.material) == 1
    total_mass = np.asarray(p.mass)[f].sum()
    expect = scene.params.n_particles * 1000.0 * scene.params.v0
    np.testing.assert_allclose(total_mass, expect, rtol=1e-5)
    # same scene, same steps -> bitwise identical positions (XLA determinism)
    _, state2, _ = run_steps(cfg, 15)
    np.testing.assert_array_equal(np.asarray(state.particles.pos),
                                  np.asarray(state2.particles.pos))


def test_dfsph_density_error_within_tolerance():
    _, _, diag = settled("dfsph")
    # solver_err is avg(rho*-rho0) after the last corrector iteration; the
    # reference tolerance is 1e-4*rho0 = 0.1 (DFSPH.py:20,238)
    assert diag["solver_err"] <= 0.1 + 1e-6
    assert 1 <= diag["solver_iters"] <= 1000


def test_dfsph_warm_start_converges_with_fewer_iterations():
    """dfsph_warm_start carries the density corrector's stiffness across
    steps: it must reach the SAME tolerance (physics quality unchanged)
    with no more cumulative iterations than the cold reference algorithm,
    and the settled state must stay physically equivalent."""
    def drive(extra):
        scene, state = load_scene(config=dam_break_cfg(
            "dfsph", dt=5e-4, extra=extra), **FAST)
        sim = simlib.Simulation(scene, state)
        tot = 0.0
        for _ in range(30):
            diag = sim.step()
            tot += float(diag["solver_iters"])
        return sim.state, {k: float(v) for k, v in diag.items()}, tot

    s_c, d_c, iters_c = drive(None)
    s_w, d_w, iters_w = drive({"dfsphWarmStart": True})
    # same convergence contract as the cold solver (DFSPH.py:20 tolerance)
    assert d_w["solver_err"] <= 0.1 + 1e-6
    assert d_w["neighbor_overflow"] == 0
    f = np.asarray(s_w.particles.material) == 1
    assert np.isfinite(np.asarray(s_w.particles.pos)[f]).all()
    # the warm start exists to SAVE work: cumulative corrector iterations
    # (the warm pre-correction counts as one) must not exceed cold's
    assert iters_w <= iters_c
    # settled bulk density in the same band as cold
    assert abs(d_w["density_max"] - d_c["density_max"]) < \
        0.15 * max(d_c["density_max"], 1.0)


def test_dfsph_warm_factor_same_tolerance():
    """dfsph_warm_factor scales the warm-start stiffness guess. The exit
    tolerance is checked on the REAL density error either way, so any factor
    must land in the same convergence contract; a stronger factor should
    need no more cumulative iterations than the conservative 0.5 default."""
    def drive(extra):
        scene, state = load_scene(config=dam_break_cfg(
            "dfsph", dt=5e-4, extra=extra), **FAST)
        sim = simlib.Simulation(scene, state)
        tot = 0.0
        for _ in range(30):
            diag = sim.step()
            tot += float(diag["solver_iters"])
        return sim.state, {k: float(v) for k, v in diag.items()}, tot

    s_h, d_h, iters_h = drive({"dfsphWarmStart": True})
    s_f, d_f, iters_f = drive({"dfsphWarmStart": True,
                               "dfsphWarmFactor": 1.0})
    assert d_f["solver_err"] <= 0.1 + 1e-6
    assert d_f["neighbor_overflow"] == 0
    f = np.asarray(s_f.particles.material) == 1
    assert np.isfinite(np.asarray(s_f.particles.pos)[f]).all()
    # stronger warm guesses must not cost meaningfully more work on a
    # settling scene; the +3 slack is intentional flakiness headroom for
    # float-reassociation-driven +-1 iteration wobble over 30 steps
    assert iters_f <= iters_h + 3
    assert abs(d_f["density_max"] - d_h["density_max"]) < \
        0.15 * max(d_h["density_max"], 1.0)


def test_dfsph_warm_start_div_same_tolerance():
    """dfsph_warm_start_div carries the divergence corrector's stiffness
    across steps. It exists for pileup scenes (10+ divergence iterations);
    on a dam break that converges in ~1 it must still reach the SAME
    tolerance with physically equivalent results and no iteration blow-up
    (the warm pre-correction counts as one iteration, so parity-converged
    scenes may tie, never exceed by more than the occasional +1 step)."""
    def drive(extra):
        scene, state = load_scene(config=dam_break_cfg(
            "dfsph", dt=1e-3, extra=extra), **FAST)
        sim = simlib.Simulation(scene, state)
        tot = 0.0
        for _ in range(30):
            diag = sim.step()
            tot += float(diag["div_iters"])
        return sim.state, {k: float(v) for k, v in diag.items()}, tot

    s_c, d_c, iters_c = drive(None)
    s_w, d_w, iters_w = drive({"dfsphWarmStartDiv": True})
    # same convergence contract as the cold solver (DFSPH.py:14-18 eta)
    eta = 1e-3 * 1000.0 / 1e-3
    assert d_w["div_err"] <= eta + 1e-3
    assert d_w["neighbor_overflow"] == 0
    f = np.asarray(s_w.particles.material) == 1
    assert np.isfinite(np.asarray(s_w.particles.pos)[f]).all()
    # no blow-up: cumulative divergence iterations stay within the cold
    # budget (+1/step worst case on already-1-iteration steps)
    assert iters_w <= iters_c + 30
    assert abs(d_w["density_max"] - d_c["density_max"]) < \
        0.15 * max(d_c["density_max"], 1.0)

    # dfsph_warm_factor also scales the divergence warm guess (ADVICE r4):
    # the full-strength factor combined with the warm-div path must keep the
    # same tolerance contract and not blow up iterations on a small scene
    s_f, d_f, iters_f = drive({"dfsphWarmStartDiv": True,
                               "dfsphWarmFactor": 1.0})
    assert d_f["div_err"] <= eta + 1e-3
    assert d_f["neighbor_overflow"] == 0
    ff = np.asarray(s_f.particles.material) == 1
    assert np.isfinite(np.asarray(s_f.particles.pos)[ff]).all()
    assert iters_f <= iters_c + 30
    # wider band than the 0.5-factor cases: full-strength warm guesses
    # overshoot transiently while the column is still falling (the
    # documented dfsph_warm_factor CAUTION, core/params.py) — the exit
    # tolerance still bounds the AVG error, not the max
    assert abs(d_f["density_max"] - d_c["density_max"]) < \
        0.25 * max(d_c["density_max"], 1.0)


def test_dfsph_adaptive_warm_factor():
    """dfsph_warm_factor_hi switches the warm strength on the carried
    rho_max gate: the scalar picks hi only when the fluid is quiescent, and
    the integrated scene keeps the cold solver's convergence contract."""
    from sph_project_tpu.solvers import dfsph

    # unit: the gate reads the carried density field
    scene, state = load_scene(config=dam_break_cfg("dfsph", dt=5e-4), **FAST)
    params = dataclasses.replace(scene.params, dfsph_warm_factor_hi=1.0,
                                 dfsph_warm_gate=1.03)
    p = state.particles
    fluid = np.asarray(p.material) == 1
    quiet = p.replace(density=jnp.where(p.material == 1, 1000.0, 0.0))
    wfq = np.asarray(dfsph.warm_factor(quiet, params))
    assert (wfq == 1.0).all()          # at rest every particle gets hi
    dens = np.where(fluid, 1000.0, 0.0)
    dens[np.argmax(fluid)] = 1100.0   # one compressed particle closes
    loud = p.replace(density=jnp.asarray(dens, jnp.float32))
    assert (np.asarray(dfsph.warm_factor(loud, params)) ==
            params.dfsph_warm_factor).all()
    # local gate: a fast particle falls back even when the global gate is
    # open (r5d: stale carries ejected rest-state particles)
    vel = np.zeros_like(np.asarray(p.vel))
    fast_row = int(np.argmax(fluid))
    vel[fast_row] = [50.0, 0.0, 0.0]
    fastp = quiet.replace(vel=jnp.asarray(vel, jnp.float32))
    wff = np.asarray(dfsph.warm_factor(fastp, params))
    assert wff[fast_row] == params.dfsph_warm_factor
    mask = np.ones(len(wff), bool)
    mask[fast_row] = False
    assert (wff[mask] == 1.0).all()
    # off by default: static factor regardless of density
    assert float(dfsph.warm_factor(loud, scene.params)) == \
        scene.params.dfsph_warm_factor

    # integration: same tolerance contract, no iteration blow-up
    def drive(extra):
        scene, state = load_scene(config=dam_break_cfg(
            "dfsph", dt=5e-4, extra=extra), **FAST)
        sim = simlib.Simulation(scene, state)
        tot = 0.0
        for _ in range(30):
            diag = sim.step()
            tot += float(diag["solver_iters"])
        return sim.state, {k: float(v) for k, v in diag.items()}, tot

    s_c, d_c, iters_c = drive({"dfsphWarmStart": True})
    s_a, d_a, iters_a = drive({"dfsphWarmStart": True,
                               "dfsphWarmFactorHi": 1.0})
    assert d_a["solver_err"] <= 0.1 + 1e-6
    assert d_a["neighbor_overflow"] == 0
    fa = np.asarray(s_a.particles.material) == 1
    assert np.isfinite(np.asarray(s_a.particles.pos)[fa]).all()
    # +3 = the same flakiness headroom as test_dfsph_warm_factor_same_tolerance
    assert iters_a <= iters_c + 3
    assert abs(d_a["density_max"] - d_c["density_max"]) < \
        0.15 * max(d_c["density_max"], 1.0)


def test_vel_cap_clamps_runaways_only():
    """The CFL speed cap (params.vel_cap_cfl) rescales only fluid particles
    beyond the cap at position-update time (measured 2562 m/s runaways at
    the headline slam, bench_r5f_warm05_settle2000.log) and stores the
    capped velocity; slower particles are untouched bit-for-bit."""
    from sph_project_tpu.solvers import common

    scene, state = load_scene(config=dam_break_cfg("dfsph", dt=5e-4), **FAST)
    params = scene.params
    assert params.vel_cap_cfl == 1.0   # guard on by default
    cap = params.vel_cap_cfl * params.particle_diameter / params.dt
    p = state.particles
    fluid = np.asarray(p.material) == 1
    rows = np.flatnonzero(fluid)[:2]
    vel = np.zeros_like(np.asarray(p.vel))
    vel[rows[0]] = [10.0 * cap, 0.0, 0.0]        # runaway
    vel[rows[1]] = [0.0, 0.3 * cap, 0.0]         # healthy
    p = p.replace(vel=jnp.asarray(vel, jnp.float32))
    p2 = common.update_fluid_position(p, state.rigid, params)
    sp = np.linalg.norm(np.asarray(p2.vel), axis=1)
    np.testing.assert_allclose(sp[rows[0]], cap, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p2.vel)[rows[1]],
                                  vel[rows[1]])
    # moved by exactly cap*dt, not 10*cap*dt
    d = np.asarray(p2.pos)[rows[0]] - np.asarray(state.particles.pos)[rows[0]]
    np.testing.assert_allclose(np.linalg.norm(d), cap * params.dt, rtol=1e-5)
    # velCapCfl=0 disables the guard
    p0 = dataclasses.replace(params, vel_cap_cfl=0.0)
    p3 = common.update_fluid_position(p, state.rigid, p0)
    np.testing.assert_array_equal(np.asarray(p3.vel), vel)


def test_wcsph_eos_and_density_clamp():
    _, state, _ = settled("wcsph")
    p = state.particles
    f = np.asarray(p.material) == 1
    dens = np.asarray(p.density)[f]
    assert (dens >= 1000.0 - 1e-3).all()          # WCSPH.py:22 clamp
    pres = np.asarray(p.pressure)[f]
    assert (pres >= -1e-3).all()                   # EOS >= 0 at rho >= rho0


@pytest.mark.slow
def test_implicit_viscosity_damps_shear():
    """High implicit viscosity should kill velocities much faster than none."""
    cfg_hi = dam_break_cfg("dfsph", dt=1e-3, visc=500.0, visc_method="implicit")
    cfg_lo = dam_break_cfg("dfsph", dt=1e-3, visc=0.0)
    _, s_hi, d_hi = run_steps(cfg_hi, 20)
    _, s_lo, d_lo = run_steps(cfg_lo, 20)
    assert d_hi["vel_max"] < d_lo["vel_max"] * 0.9
    assert np.isfinite(np.asarray(s_hi.particles.vel)).all()


@pytest.mark.slow
def test_entry_time_activation():
    cfg = dam_break_cfg("wcsph", dt=1e-3)
    cfg.config["FluidBlocks"].append({
        "objectId": 1, "start": [0.3, 0.3, 0.3], "end": [0.4, 0.4, 0.4],
        "translation": [0, 0, 0], "scale": [1, 1, 1], "velocity": [0, 0, 0],
        "density": 1000.0, "color": [200, 50, 50], "entryTime": 0.01})
    scene, state = load_scene(config=cfg, **FAST)
    sim = simlib.Simulation(scene, state)
    def active_of(obj):
        p = sim.state.particles
        return int(np.sum((np.asarray(p.material) != 0) &
                          (np.asarray(p.object_id) == obj)))
    assert active_of(1) == 0
    for _ in range(12):   # 12 steps > 0.01s/1e-3
        sim.step()
    assert active_of(1) > 0


def test_warm_fused_pass_matches_separate_passes():
    """nonpressure_warm_fused (the warm-start correction riding the
    non-pressure pass) must produce EXACTLY the sums of running
    nonpressure_fused and the warm _correction as separate passes — the
    fusion is a pass-count optimization, not a numerics change."""
    from sph_project_tpu.solvers import common, dfsph

    scene, state = load_scene(config=dam_break_cfg(
        "dfsph", dt=5e-4, extra={"dfsphWarmStart": True}), **FAST)
    params = scene.params
    sim = simlib.Simulation(scene, state)
    for _ in range(8):
        sim.step()                    # build up a nonzero kappa carry
    state = sim.state
    p, rigid = state.particles, state.rigid
    env = state.cached_neighbors
    sl = common.particle_slabs(env, p, common.STATIC_SLAB_KEYS)
    fluid_i = p.material == 1
    # synthetic positive stiffness carry (early fall leaves the real carry
    # at zero — star clamps to 1 in free fall); exactness must hold for ANY
    # kappa, so a random one tests the fusion more strongly
    key = jax.random.PRNGKey(7)
    kappa_w = jnp.where(
        fluid_i, jnp.abs(jax.random.normal(key, fluid_i.shape)) * 1e-3, 0.0)

    a_f, vf_f, vt_f, dv_f, wf_f, wt_f = dfsph.nonpressure_warm_fused(
        p, rigid, kappa_w, env, sl, params)
    a_s, vf_s, vt_s = common.nonpressure_fused(p, rigid, env, sl, params)
    dv_s, wf_s, wt_s = dfsph._correction(p, rigid, kappa_w, None, env, sl,
                                         params)
    assert float(jnp.max(jnp.abs(dv_f))) > 0.0  # correction actually acts
    for x, y in [(a_f, a_s), (vf_f, vf_s), (vt_f, vt_s),
                 (dv_f, dv_s), (wf_f, wf_s), (wt_f, wt_s)]:
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
