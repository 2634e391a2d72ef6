"""Benchmark: particle-steps/sec on the flagship DFSPH dam-break.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md: no timing code in
the repo, "published": {}). vs_baseline is therefore measured against an
*estimated* A100-Taichi figure for the same workload class: Taichi DFSPH at
~1M particles with its per-iteration host sync runs O(5-15) steps/s on A100,
i.e. ~1e7 particle-steps/s. We use 1.0e7 as the denominator until a measured
reference number replaces it.

Scene: dam-break matching the scale class of data/scenes/final_scene0.json
(large fluid block, DFSPH, standard viscosity). Particle count is chosen by
--n target (default ~400k) so the benchmark finishes quickly on one chip; pass
--n 1231200 for the headline scene scale.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

A100_TAICHI_ESTIMATE = 1.0e7  # particle-steps/sec (see module docstring)


def build(n_target: int):
    from sph_project_tpu.utils.config import SimConfig
    from sph_project_tpu.scene import load_scene

    # cube with ~n_target particles at spacing 0.02 inside a tall domain
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
        # block seeded just above the floor: it compresses under gravity so
        # the pressure correctors iterate at realistic counts (a free-falling
        # block converges in 1 iteration and would flatter the benchmark)
        "FluidBlocks": [{
            "objectId": 0,
            "start": [0.1, 0.045, 0.1],
            "end": [0.1 + side, 0.045 + side, 0.1 + side],
            "translation": [0, 0, 0], "scale": [1, 1, 1],
            "velocity": [0, 0, 0], "density": 1000.0,
            "color": [50, 100, 200], "entryTime": -1.0,
        }],
    })
    return load_scene(config=cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400_000, help="target particle count")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()

    import jax
    from sph_project_tpu import sim as simlib

    scene, state = build(args.n)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = jax.jit(simlib.get_step_fn(params))

    for _ in range(args.warmup):
        state, diag = step(state)
    jax.block_until_ready(state.particles.pos)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, diag = step(state)
    jax.block_until_ready(state.particles.pos)
    dt = time.perf_counter() - t0

    steps_per_s = args.steps / dt
    pps = steps_per_s * params.n_particles
    assert bool(np.isfinite(np.asarray(state.particles.pos)).all()), "NaN in benchmark run"
    print(json.dumps({
        "metric": f"particle-steps/sec (DFSPH dam break, {params.n_particles} particles)",
        "value": round(pps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(pps / A100_TAICHI_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
