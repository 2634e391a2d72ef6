"""bench.py machinery tests (CPU, tiny scenes): the suite runner's per-entry
isolation and the physics gates. The driver runs bench.py on real hardware at
round end; these tests pin the artifact's SHAPE so a refactor can't silently
drop the suite array or the gate fields from BENCH_rN.json."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _args(**over):
    d = dict(verbose=False, suite_settle=2, sort_incremental=False,
             warm_start=True, cold=False, warm_div=False, warm_factor=None,
             warm_hi=None, omega=None, load_settled=None,
             chunk=2, reps=1, allow_overflow=-1)
    d.update(over)
    return argparse.Namespace(**d)


def test_run_suite_entry_shape_and_isolation(monkeypatch):
    """A healthy scene yields value+iters+gates+physics fields; a broken
    scene records an error entry instead of raising (per-entry isolation —
    a wedged suite scene must not cost the round its headline artifact)."""
    monkeypatch.setattr(bench, "SUITE_SCENES", [
        ("smoke_test.json", "tiny smoke"),
        ("does_not_exist.json", "missing scene"),
    ])
    monkeypatch.setattr(bench, "wait_for_device", lambda *a, **k: True)
    entries = bench.run_suite(_args(), {}, verbose=False)
    assert len(entries) == 2
    ok, bad = entries
    assert ok["scene"] == "smoke_test.json"
    assert "error" not in ok
    assert ok["value"] > 0 and ok["unit"] == "particle-steps/s"
    assert len(ok["iters"]) == 2
    for key in ("density_avg", "density_max", "vel_max", "gates",
                "overflow", "overflow_sort", "overflow_window", "n_fluid"):
        assert key in ok, key
    assert isinstance(ok["gates"]["violations"], list)
    assert bad["scene"] == "does_not_exist.json"
    assert "error" in bad and "value" not in bad


def test_physics_gates_bands():
    class P:
        dt = 6e-4
        particle_diameter = 0.02
        density0 = 1000.0

    healthy = {"vel_max": 5.0, "density_avg": 820.0}
    g = bench.physics_gates(healthy, P)
    assert g["violations"] == []
    assert abs(g["cfl_outlier"] - 5.0 * 6e-4 / 0.02) < 1e-9

    # a particle outrunning its diameter per step violates the outlier CFL
    fast = {"vel_max": 40.0, "density_avg": 820.0}
    assert any("diameter" in v for v in bench.physics_gates(fast, P)["violations"])

    # density average inside the healthy [0.72, 1.01] band at BOTH measured
    # regimes (mid-fall ~0.83, hydrostatic settle ~0.94 — r5j)
    settled = {"vel_max": 5.0, "density_avg": 944.0}
    assert bench.physics_gates(settled, P)["violations"] == []
    # ... and outside it for the corruption modes the gate exists for
    blowup = {"vel_max": 5.0, "density_avg": 1020.0}
    assert any("density_avg" in v
               for v in bench.physics_gates(blowup, P)["violations"])
    thin = {"vel_max": 5.0, "density_avg": 600.0}
    assert any("density_avg" in v
               for v in bench.physics_gates(thin, P)["violations"])


def test_settle_to_step_derivation():
    """--settle-to converts sim-time to steps with the scene dt (the headline
    default 0.75 s at dt=6e-4 is 1250 steps — post-collapse, VERDICT r4)."""
    assert max(1, round(0.75 / 6e-4)) == 1250
