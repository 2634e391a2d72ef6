"""Benchmark: particle-steps/sec on the flagship DFSPH dam-break scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"suite": [...]}.

Default workload: ``data/scenes/large_scale_dfsph.json`` — the SHIPPED scene
file reproducing the reference's 1.23M-particle headline demo geometry
(final_scene0.json; README.md:50-53 in jason-huang03/SPH_Project): the same
fluid block (1,231,200 particles at spacing 0.02), domain, dt, viscosity, and
domain-box walls. ``--n`` switches to a synthetic cube for sweeps.

Measurement protocol (two operating points, the SETTLED one is the headline):
- "early fall": timed right after compile, while the column is still falling
  and the DFSPH correctors converge in ~1 iteration — the *easiest* regime.
- "settled": timed after the settle phase, once the collapsed fluid churns
  against the floor and the pressure correctors iterate at realistic counts
  (the reference's workload regime; its solvers print exactly these iteration
  counts per step, DFSPH.py:159,243). The published value and vs_baseline use
  THIS number. The settle budget defaults to SIM-TIME 0.75 s (--settle-to;
  1250 steps at the headline dt=6e-4) so "settled" means post-collapse, not
  mid-fall; --settle N pins a step count instead.

Physics gates (round 5): the settled sample must satisfy
``vel_max*dt <= particle_diameter`` (no particle outruns its own diameter per
step — outlier-CFL) and ``density_avg in [0.75, 0.90]*rho0`` (the V0=0.8
lattice convention puts a healthy settled average near 0.8*rho0, slightly
below for free surfaces). Violations TAINT the metric string and are listed
in ``gates.violations`` — a fast number cannot hide corrupted physics.

The reference publishes no throughput numbers and cannot be run here (taichi
is not installed; no package installation or network egress). vs_baseline
divides by 1.0e7 particle-steps/s — the TOP of the plausible A100-Taichi band
derived in BASELINE.md ("Why the denominator is estimated"). Throughput
counts FLUID particles only (the walls are overhead both frameworks pay).

Suite (round 5): unless --no-suite, the JSON also carries a ``suite`` array
covering the other four BASELINE.md target configs (nine-rigid coupling,
dragon bath, high-viscosity implicit CG, buckling emitter) under a shorter
mid-regime protocol — value + iters + physics fields each, errors recorded
per-entry instead of aborting the artifact.

Tunnel-hardened details (the TPU is reached through a remote-execution
tunnel): sync via scalar fetch (`block_until_ready` is a no-op through the
tunnel); inputs chain rep-to-rep so the dispatch cache can't serve results;
persistent compilation cache keeps reruns off the slow remote compiler.

Overflow gate: SORT overflow means zeroed particle records — corruption — and
is hard-gated at ZERO. Window truncation means a few dropped neighbor
candidates at spray-block edges (ballistic particles whose windows exceed the
VMEM budget on their worst step); it is gated at a per-step FRACTION of the
particle count (default 1e-3, i.e. ~7e-7 of scanned candidates) and reported
in the JSON + metric taint whenever nonzero. ``--allow-overflow N`` overrides
the truncation bound for diagnostic sweeps.

Wedge-hardening (round 4): the tunnel TPU worker sometimes crashes/restarts
mid-run and self-heals in ~5-15 min (ROADMAP "Environment gotchas"). Every
phase runs under retry: the device is health-polled before heavy work, the
state is snapshotted to host every 250 settle steps, and a settled-phase
crash restores the latest snapshot and retries after backoff. If the settled
phase is unrecoverable, the JSON line is STILL printed with the early-fall
value (including its physics fields, labeled early-fall) and
``"settled": "crashed"`` so the round keeps a driver-captured number.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

A100_TAICHI_ESTIMATE = 1.0e7  # particle-steps/sec (see module docstring)
HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "data", "scenes")
DEFAULT_SCENE = os.path.join(SCENES, "large_scale_dfsph.json")

# the other four BASELINE.md target configs (headline is the main protocol)
SUITE_SCENES = [
    ("coupling_nine_rigid.json", "nine-rigid coupling (final_scene1)"),
    ("dragon_bath_dfsph.json", "dragon bath DFSPH"),
    ("high_viscosity_implicit.json", "high-viscosity implicit CG (final_scene2)"),
    ("buckling_emitter.json", "buckling emitter, implicit CG (final_scene3)"),
]


def wait_for_device(max_wait_s: float = 1200.0, poll_s: float = 30.0) -> bool:
    """Poll the backend with a trivial dispatch until it answers.

    The tunnel TPU wedges for ~5-15 min after worker crashes; poll (don't
    spin) until a scalar round-trip succeeds. Returns True when healthy.
    """
    import jax
    import jax.numpy as jnp

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        try:
            val = float(jax.jit(lambda x: x + 1.0)(jnp.float32(attempt)))
            if val == attempt + 1.0:
                return True
        except Exception as e:  # noqa: BLE001 — any backend error means "wait"
            print(f"# device unhealthy ({type(e).__name__}); "
                  f"retry in {poll_s:.0f}s", flush=True)
        if time.monotonic() > deadline:
            return False
        time.sleep(poll_s)
        attempt += 1


def snapshot_to_host(state):
    """Device→host copy of the full state pytree (crash-recovery anchor)."""
    import jax
    return jax.tree.map(lambda x: np.asarray(x), state)


def restore_from_host(snap):
    import jax
    return jax.tree.map(jax.device_put, snap)


def build_synthetic(n_target: int, backend: str | None = None):
    from sph_project_tpu.utils.config import SimConfig
    from sph_project_tpu.scene import load_scene

    # cube with ~n_target particles at spacing 0.02 inside a tall domain,
    # seeded just above the floor so it compresses under gravity
    side = round(n_target ** (1.0 / 3.0)) * 0.02
    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0.0, 0.0, 0.0],
            "domainEnd": [max(2.0 * side, 1.0), max(3.0 * side, 1.0), max(2.0 * side, 1.0)],
            "addDomainBox": False, "particleRadius": 0.01,
            "density0": 1000, "gravitation": [0.0, -9.81, 0.0],
            "simulationMethod": "dfsph", "viscosityMethod": "standard",
            "timeStepSize": 6e-4, "viscosity": 0.05,
        },
        "FluidBlocks": [{
            "objectId": 0,
            "start": [0.1, 0.045, 0.1],
            "end": [0.1 + side, 0.045 + side, 0.1 + side],
            "translation": [0, 0, 0], "scale": [1, 1, 1],
            "velocity": [0, 0, 0], "density": 1000.0,
            "color": [50, 100, 200], "entryTime": -1.0,
        }],
    })
    kw = {"pair_backend": backend} if backend else {}
    return load_scene(config=cfg, **kw)


def apply_knobs(scene, args):
    """Fold the bench algorithm knobs into scene.params; returns a label
    suffix describing the non-default ones."""
    suffix = ""
    if args.sort_incremental:
        scene.params = dataclasses.replace(scene.params, sort_incremental=True)
        suffix += " +inc-sort"
    if args.warm_start and not args.cold:
        scene.params = dataclasses.replace(scene.params, dfsph_warm_start=True)
        suffix += " +warm"
    if args.warm_div:
        scene.params = dataclasses.replace(scene.params,
                                           dfsph_warm_start_div=True)
        suffix += " +warmdiv"
    if args.warm_factor is not None:
        scene.params = dataclasses.replace(
            scene.params, dfsph_warm_factor=args.warm_factor)
        suffix += f" wf={args.warm_factor:g}"
    if args.warm_hi is not None and args.warm_hi > 0:
        scene.params = dataclasses.replace(
            scene.params, dfsph_warm_factor_hi=args.warm_hi)
        suffix += f" wfhi={args.warm_hi:g}"
    if args.omega is not None:
        scene.params = dataclasses.replace(
            scene.params, dfsph_omega=args.omega)
        suffix += f" om={args.omega:g}"
    return suffix


def physics_gates(diag, params) -> dict:
    """Settled-sample physics gates (VERDICT r4 weak #4): outlier CFL and
    the density-average band. Returns the gate values + violation list."""
    vmax = float(diag["vel_max"])
    rho_avg = float(diag["density_avg"])
    cfl = vmax * params.dt / params.particle_diameter
    frac = rho_avg / params.density0
    violations = []
    if cfl > 1.0:
        violations.append(
            f"vel_max*dt/diameter {cfl:.2f} > 1 (a particle moves more than "
            f"one diameter per step)")
    # healthy regimes measured at the headline: mid-fall churn ~0.83*rho0
    # (the V0=0.8 entry lattice), full hydrostatic settle ~0.94 (the pool
    # compacts toward kernel-consistent packing — bench_r5j_su_fix.log).
    # The gate exists to catch corruption: zeroed/lost records collapse the
    # average toward 0, solver blow-ups push it past rho0.
    if not (0.72 <= frac <= 1.01):
        violations.append(
            f"density_avg {frac:.3f}*rho0 outside [0.72, 1.01] "
            f"(mass-loss / blow-up band)")
    return {
        "cfl_outlier": round(cfl, 3),
        "density_avg_frac": round(frac, 4),
        "violations": violations,
    }


def physics_fields(diag) -> dict:
    return {
        "density_avg": round(float(diag["density_avg"]), 2),
        "density_max": round(float(diag["density_max"]), 2),
        "vel_max": round(float(diag["vel_max"]), 3),
    }


class Runner:
    """Per-scene measurement machinery: jitted step, overflow accounting,
    chunked timing with tunnel-safe scalar-fetch sync."""

    def __init__(self, scene, state, args):
        import jax
        from sph_project_tpu import sim as simlib
        from sph_project_tpu.core.params import MATERIAL_FLUID

        self._jax = jax
        self._simlib = simlib
        self.params = scene.params
        self.args = args
        self.n_fluid = sum(o.particle_num for o in scene.objects
                           if o.material == MATERIAL_FLUID)
        self.snap0 = snapshot_to_host(state)
        self.state = None
        self.step = None
        self.max_win_ovf = 0
        self.max_sort_ovf = 0

    def fresh(self):
        s = restore_from_host(self.snap0)
        s = self._jax.jit(
            lambda s: self._simlib.prepare(s, self.params))(s)
        float(s.t)  # force completion through the tunnel
        self.step = self._simlib._jitted_step(self.params)
        self.state = s

    def load_settled(self, path):
        """Resume from a settled-state checkpoint (tools/warm_diag.py /
        omega_diag.py --save-state) instead of settling live. A/B-knob
        convenience: the loaded state was settled under the CHECKPOINT's
        knobs, so only the timed phase reflects the current ones — the
        official protocol (driver runs, BENCH_rN) always settles live.

        The restored plane-padded layout came from the WRITER's compiled
        program, whose cell binning can disagree with this config's on
        lattice edge-sitters (the r4 cross-program lesson; measured r5c as
        sort overflow 2810 on a knob change) — so re-run prepare(): its
        exact-gather sort rebuilds the layout under the CURRENT program and
        reseeds density/alpha to the same values."""
        from sph_project_tpu.io import checkpoint
        self.fresh()
        self.state, _ = self.step(self.state)   # populate env structure
        s = checkpoint.restore(path, self.state)
        self.state = self._jax.jit(
            lambda s: self._simlib.prepare(s, self.params))(s)
        float(self.state.t)

    def rebuild_step(self):
        self.step = self._simlib._jitted_step(self.params)

    def run_steps(self, n):
        diag = None
        for _ in range(n):
            self.state, diag = self.step(self.state)
        # the state carries overflow ACCUMULATORS across steps, so this
        # once-per-chunk fetch sees every intermediate step's overflow
        # (a per-step-only fetch missed the inc-sort corruption on step 0)
        if "sort_overflow_acc" in diag:
            self.max_sort_ovf = max(self.max_sort_ovf,
                                    int(diag["sort_overflow_acc"]))
            self.max_win_ovf = max(self.max_win_ovf,
                                   int(diag["window_overflow_max"]))
        else:
            ovf = int(diag["neighbor_overflow"])
            sort_ovf = int(diag.get("sort_overflow", 0))
            self.max_win_ovf = max(self.max_win_ovf, ovf - sort_ovf)
            self.max_sort_ovf = max(self.max_sort_ovf, sort_ovf)
        float(self.state.t)
        return diag

    def timed_phase(self, label, chunk, reps):
        times, diag = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            diag = self.run_steps(chunk)
            times.append(time.perf_counter() - t0)
        steps_per_s = chunk / min(times)
        pps = steps_per_s * self.n_fluid
        # feed-forward methods (wcsph) have no iterative solver diag
        iters = (int(diag.get("solver_iters", 0)),
                 int(diag.get("div_iters", 0)))
        if self.args.verbose:
            print(f"# {label}: times={['%.2f' % t for t in times]} "
                  f"steps/s={steps_per_s:.2f} fluid-p-steps/s={pps:.3g} "
                  f"dens_iters={iters[0]} div_iters={iters[1]}", flush=True)
        return pps, iters, diag

    def overflow_fields(self) -> dict:
        return {
            "overflow": self.max_win_ovf + self.max_sort_ovf,
            "overflow_window": self.max_win_ovf,
            "overflow_sort": self.max_sort_ovf,
        }


def run_suite(args, kw, verbose):
    """Short mid-regime protocol over the four non-headline BASELINE.md
    configs. Per-entry errors are recorded, never raised — a wedged scene
    must not cost the round its artifact."""
    from sph_project_tpu.scene import load_scene

    entries = []
    for fname, desc in SUITE_SCENES:
        entry = {"scene": fname, "desc": desc,
                 "protocol": f"short mid-regime: settle {args.suite_settle}, "
                             f"chunk 10 x 2"}
        t_start = time.monotonic()
        try:
            if not wait_for_device():
                raise RuntimeError("device unavailable")
            scene, state = load_scene(os.path.join(SCENES, fname), **kw)
            entry["knobs"] = apply_knobs(scene, args).strip()
            r = Runner(scene, state, args)
            r.fresh()
            r.run_steps(3)  # compile + warm
            done = 0
            while done < args.suite_settle:
                n = min(50, args.suite_settle - done)
                diag = r.run_steps(n)
                done += n
                if verbose:
                    print(f"#   {fname} settle {done}/{args.suite_settle}: "
                          f"iters={int(diag.get('solver_iters', 0))}/"
                          f"{int(diag.get('div_iters', 0))} "
                          f"rho_max={float(diag['density_max']):.0f}",
                          flush=True)
            pps, iters, diag = r.timed_phase(f"suite:{fname}", 10, 2)
            entry.update({
                "n_fluid": r.n_fluid,
                "n_total": r.params.n_particles,
                "value": round(pps, 1),
                "unit": "particle-steps/s",
                "iters": list(iters),
                "gates": physics_gates(diag, r.params),
                **physics_fields(diag),
                **r.overflow_fields(),
            })
            if "cg_iters" in diag:
                entry["cg_iters"] = int(diag["cg_iters"])
            if r.max_sort_ovf > 0:
                entry["error"] = (f"sort overflow {r.max_sort_ovf}: "
                                  f"corrupted, value not comparable")
        except Exception as e:  # noqa: BLE001 — per-entry isolation
            entry["error"] = f"{type(e).__name__}: {e}"
        entry["wall_s"] = round(time.monotonic() - t_start, 1)
        if verbose:
            print(f"# suite entry: {json.dumps(entry)}", flush=True)
        entries.append(entry)
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=DEFAULT_SCENE,
                    help="scene JSON to benchmark (the shipped headline scene)")
    ap.add_argument("--n", type=int, default=0,
                    help="synthetic-cube particle count (overrides --scene)")
    ap.add_argument("--chunk", type=int, default=25, help="steps per timing rep")
    ap.add_argument("--reps", type=int, default=3, help="timed reps per phase")
    ap.add_argument("--settle", type=int, default=None,
                    help="settle steps before the settled-regime measurement "
                         "(overrides --settle-to)")
    ap.add_argument("--settle-to", type=float, default=0.75,
                    help="settle to this SIM TIME in seconds (default 0.75 — "
                         "past the headline column collapse; at dt=6e-4 that "
                         "is 1250 steps)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--backend", default=None,
                    help="pair engine override (pallas / pallas_dma / jax)")
    ap.add_argument("--allow-overflow", type=int, default=-1,
                    help="tolerated per-step WINDOW truncation (default: "
                         "1e-3 of the particle count; sort overflow is "
                         "always hard-gated at zero)")
    ap.add_argument("--sort-incremental", action="store_true",
                    help="A/B: build sort permutations incrementally "
                         "(params.sort_incremental)")
    ap.add_argument("--warm-start", action="store_true", default=True,
                    help="warm-start the DFSPH density corrector from the "
                         "previous step (params.dfsph_warm_start; same "
                         "convergence tolerance, one fewer pair pass per "
                         "step). DEFAULT ON since the hardware A/B: settled "
                         "1.91e6 vs cold 1.67e6 at the headline scene, "
                         "overflow 0. The metric label carries '+warm'.")
    ap.add_argument("--cold", action="store_true",
                    help="disable the warm start (the reference's "
                         "cold-every-step algorithm, for parity A/Bs)")
    ap.add_argument("--warm-factor", type=float, default=None,
                    help="warm-start strength (params.dfsph_warm_factor; "
                         "default 0.5). Stronger factors start the corrector "
                         "closer to the previous step's converged stiffness "
                         "and can drop a whole iteration at the same exit "
                         "tolerance")
    ap.add_argument("--warm-hi", type=float, default=1.0,
                    help="adaptive warm strength on quiescent steps "
                         "(params.dfsph_warm_factor_hi; double-gated on "
                         "carried rho_max + per-particle CFL-quiet). "
                         "Default 1.0: holds the hydrostatic headline at "
                         "2-4 corrector iterations where the 0.5 carry "
                         "crawls at 9-14 (r5e/r5g). 0 disables (plain "
                         "dfsph_warm_factor carry).")
    ap.add_argument("--load-settled", default=None,
                    help="A/B convenience: resume the settled phase from a "
                         "tools/*_diag.py --save-state checkpoint instead "
                         "of settling live (labels the metric; the official "
                         "driver protocol always settles live). CAVEAT "
                         "(r5c, hardware-measured): only safe when the "
                         "current knobs compile the SAME program as the "
                         "checkpoint writer's — a different program can bin "
                         "lattice edge-sitters into different cells than "
                         "the restored plane-padded layout assumes, "
                         "overflowing a plane's pad budget (sort overflow "
                         "2810 at the headline, bench_r5c_loaded_warmhi."
                         "log); the gate catches it and refuses the number.")
    ap.add_argument("--omega", type=float, default=None,
                    help="density-corrector over-relaxation "
                         "(params.dfsph_omega; 1.0 = reference algorithm)")
    ap.add_argument("--warm-div", action="store_true",
                    help="also warm-start the divergence corrector "
                         "(params.dfsph_warm_start_div; pays off on "
                         "pileup scenes where it iterates 10+, costs one "
                         "extra pass where it converges in 1)")
    ap.add_argument("--no-suite", action="store_true",
                    help="skip the 4-scene BASELINE.md suite after the "
                         "headline protocol")
    ap.add_argument("--suite-settle", type=int, default=60,
                    help="settle steps per suite scene (short protocol)")
    args = ap.parse_args()

    import jax
    # the TPU plugin swallows the JAX_PLATFORMS env var — honor it through
    # jax.config so CPU smoke runs don't hang on a down tunnel (ROADMAP gotcha)
    platform = os.environ.get("JAX_PLATFORMS")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.n:
        scene, state = build_synthetic(args.n, args.backend)
        workload = f"synthetic cube {args.n}"
    else:
        from sph_project_tpu.scene import load_scene
        kw = {"pair_backend": args.backend} if args.backend else {}
        scene, state = load_scene(args.scene, **kw)
        workload = os.path.basename(args.scene)
    workload += apply_knobs(scene, args)
    if args.load_settled:
        workload += " +loaded-settle"
    params = scene.params
    settle_steps = (args.settle if args.settle is not None
                    else max(1, round(args.settle_to / params.dt)))
    if not wait_for_device():
        raise SystemExit("TPU backend unavailable after 20 min of polling")

    # single-step dispatches (a lax.scan wrapper doubles peak memory and
    # kills the TPU worker at 1.23M particles); per-rep scalar-fetch sync.
    # donate_argnums halves peak memory — required at 1.23M
    r = Runner(scene, state, args)

    # --- early-fall phase: compile + warm + first timing, retried on wedge
    early_pps = early_iters = ediag = None
    for attempt in range(3):
        try:
            r.fresh()
            r.run_steps(3)                 # compile + warm
            early_pps, early_iters, ediag = r.timed_phase(
                "early-fall", args.chunk, args.reps)
            break
        except Exception as e:  # noqa: BLE001 — tunnel wedge, retry
            print(f"# early-fall attempt {attempt} crashed: "
                  f"{type(e).__name__}: {e}", flush=True)
            if attempt == 2 or not wait_for_device():
                raise

    # host anchor, refreshed every 250 settle steps: a settled-phase crash
    # restores the latest anchor instead of losing the whole settle
    snap = snapshot_to_host(r.state)
    snap_done = 0

    # --- settle + settled phase, retried from the anchor on wedge ---
    settled_error = None
    pps = iters = sdiag = None
    settle_win_ovf = 0
    for attempt in range(3):
        try:
            # test hook: BENCH_INJECT_SETTLED_CRASH=once|always exercises the
            # retry / salvage paths without a real device wedge
            inject = os.environ.get("BENCH_INJECT_SETTLED_CRASH", "")
            if inject == "always" or (inject == "once" and attempt == 0):
                raise RuntimeError("injected settled-phase crash (test hook)")
            done = snap_done
            if args.load_settled:
                r.load_settled(args.load_settled)
                done = settle_steps
            while done < settle_steps:
                step_n = min(50, settle_steps - done)
                diag = r.run_steps(step_n)
                done += step_n
                if args.verbose:
                    print(f"# settle {done}/{settle_steps}: iters="
                          f"{int(diag.get('solver_iters', 0))}/"
                          f"{int(diag.get('div_iters', 0))} "
                          f"rho_max={float(diag['density_max']):.0f} "
                          f"vel_max={float(diag['vel_max']):.1f} "
                          f"sort_ovf={int(diag.get('sort_overflow_acc', 0))} "
                          f"win_ovf={int(diag.get('window_overflow_max', 0))}",
                          flush=True)
                if done - snap_done >= 250 and done < settle_steps:
                    snap = snapshot_to_host(r.state)
                    snap_done = done
            # split window-truncation accounting at the phase boundary:
            # settle-phase transients (spray-churn window blowups, r5g/r5h)
            # are REPORTED (overflow_window_settle_max + a taint marker) but
            # only the MEASURED phase is gated — unlike sort overflow, a
            # truncated window drops that step's candidates without zeroing
            # records, so it does not corrupt the state it leaves behind;
            # the settled state's health is attested by the physics gates.
            settle_win_ovf = r.max_win_ovf
            r.max_win_ovf = 0
            r.state = r.state.replace(
                window_overflow_max=r.state.window_overflow_max * 0)
            pps, iters, sdiag = r.timed_phase("settled", args.chunk, args.reps)
            settled_error = None
            break
        except Exception as e:  # noqa: BLE001 — tunnel wedge, retry
            settled_error = f"{type(e).__name__}: {e}"
            print(f"# settled attempt {attempt} crashed: {settled_error}",
                  flush=True)
            if attempt == 2 or not wait_for_device():
                break
            r.rebuild_step()
            r.state = restore_from_host(snap)

    def refuse(reason):
        # print a machine-readable refusal line BEFORE exiting nonzero: a
        # driver capturing stdout gets an honest zero-valued artifact with
        # the reason, instead of nothing (a raised assertion used to leave
        # no JSON at all)
        print(json.dumps({
            "metric": f"settled particle-steps/sec (REFUSED: {workload})",
            "value": 0, "unit": "particle-steps/s", "vs_baseline": 0.0,
            "refused": reason,
        }))
        raise SystemExit(1)

    tainted = ""
    if r.max_sort_ovf > 0:
        refuse(f"sort overflow {r.max_sort_ovf} (> 0): zeroed particle "
               f"records, corrupted physics — number not publishable")
    win_bound = args.allow_overflow if args.allow_overflow >= 0 else \
        max(1, int(1e-3 * params.n_particles))
    if r.max_win_ovf > win_bound:
        refuse(f"MEASURED-phase window truncation {r.max_win_ovf} "
               f"(> {win_bound}, 1e-3 of {params.n_particles} particles): "
               f"degraded physics in the timed steps — not publishable")
    if r.max_win_ovf > 0:
        tainted = f" [WINDOW-TRUNC {r.max_win_ovf}]"
    if settle_win_ovf > win_bound:
        tainted += f" [WINDOW-TRUNC-SETTLE {settle_win_ovf}]"

    suite = None
    if not args.no_suite and not args.n:
        suite = run_suite(args, kw if not args.n else {}, args.verbose)

    if pps is None:
        # settled phase unrecoverable: publish the early-fall number tainted
        # rather than exiting 1 — a driver-captured partial beats nothing.
        # The early-fall diag's physics fields ride along (labeled by the
        # metric itself as early-fall) so even the salvage number cannot
        # hide behind missing sanity fields (ADVICE r4).
        egates = physics_gates(ediag, params)
        out = {
            "metric": f"EARLY-FALL particle-steps/sec (DFSPH, {workload}, "
                      f"{r.n_fluid} fluid / {params.n_particles} total "
                      f"particles, iters {early_iters[0]}/{early_iters[1]})"
                      f"{tainted} [SETTLED PHASE CRASHED — early-fall value, "
                      f"easier regime]",
            "value": round(early_pps, 1),
            "unit": "particle-steps/s",
            "vs_baseline": round(early_pps / A100_TAICHI_ESTIMATE, 3),
            "early_fall_value": round(early_pps, 1),
            "early_fall_iters": list(early_iters),
            "settled": "crashed",
            "settled_error": settled_error,
            **physics_fields(ediag),
            "gates": {**egates, "note": "early-fall sample — mid-fall CFL "
                      "violations expected, fields informational"},
            **r.overflow_fields(),
        }
        if suite is not None:
            out["suite"] = suite
        print(json.dumps(out))
        return

    assert bool(np.isfinite(np.asarray(r.state.particles.pos)).all()), \
        "NaN in benchmark"
    gates = physics_gates(sdiag, params)
    if gates["violations"]:
        tainted += f" [PHYSICS-GATE: {'; '.join(gates['violations'])}]"
    out = {
        "metric": f"settled particle-steps/sec (DFSPH, {workload}, "
                  f"{r.n_fluid} fluid / {params.n_particles} total "
                  f"particles, iters {iters[0]}/{iters[1]}){tainted}",
        "value": round(pps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(pps / A100_TAICHI_ESTIMATE, 3),
        "early_fall_value": round(early_pps, 1),
        "early_fall_iters": list(early_iters),
        "settled_iters": list(iters),
        "settle_steps": settle_steps,
        "settled_sim_time": round(settle_steps * params.dt, 4),
        # physics sanity beside the perf number: algorithm knobs (warm
        # start / factor) must leave the settled density field in the same
        # band as the cold reference algorithm
        **physics_fields(sdiag),
        "gates": gates,
        **r.overflow_fields(),
        # settle-phase transients (spray-churn window blowups) — reported,
        # taint-marked above the bound, but only the MEASURED phase gates
        "overflow_window_settle_max": settle_win_ovf,
    }
    if suite is not None:
        out["suite"] = suite
    print(json.dumps(out))


if __name__ == "__main__":
    main()
