"""Scene-loading golden counts, checkpoint round-trip, exporter round-trips,
and rigid free-fall — the IO / scene layer the reference only ever validated
by eye (SURVEY.md §4).

Golden values are structural parity anchors: the lattice counts follow the
reference's ``np.arange(start, end, 2r)`` block fill
(base_container.py:753-798) and the PCISPH stiffness follows its ideal-lattice
sum (PCISPH.py:128-151), so drift in either breaks scene parity.
"""
import glob
import json
import os

import numpy as np
import pytest

from sph_project_tpu.core.params import MATERIAL_FLUID, make_params
from sph_project_tpu.scene import load_scene
from sph_project_tpu.io import checkpoint, exporters

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "..", "data", "scenes")


def _smoke_scene():
    return load_scene(os.path.join(SCENES, "smoke_test.json"))


def test_block_lattice_golden_count():
    """smoke_test block (0.05..0.25, 0.05..0.3, 0.05..0.25) at r=0.01:
    np.arange per axis gives 10 x 13 x 10 = 1300 fluid particles."""
    scene, state = _smoke_scene()
    mat = np.asarray(state.particles.material)
    assert int((mat == MATERIAL_FLUID).sum()) == 1300


def test_pcisph_k_golden():
    """Ideal-lattice stiffness for r=0.01, dt=8e-4 (PCISPH.py:128-151)."""
    from sph_project_tpu.solvers.pcisph import compute_pcisph_k
    p = make_params(100, particle_radius=0.01, dt=8e-4, dim=3)
    assert compute_pcisph_k(p) == pytest.approx(-989.2840872, rel=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    scene, state = _smoke_scene()
    ck = str(tmp_path / "ckpt")
    checkpoint.save(ck, state)
    state2 = checkpoint.restore(ck, state)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_structure_mismatch(tmp_path):
    scene, state = _smoke_scene()
    ck = str(tmp_path / "ckpt")
    checkpoint.save(ck, state)
    with pytest.raises(ValueError, match="structure mismatch"):
        checkpoint.restore(ck, {"not": np.zeros(3), "the_same": np.ones(2)})


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).rand(37, 3).astype(np.float32)
    path = str(tmp_path / "p.ply")
    exporters.write_ply(path, pts)
    back = exporters.read_ply(path)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_frame_exporter_layout(tmp_path):
    """FrameExporter mirrors the reference's <out>/<frame:06d>/ layout
    (run_simulation.py:131-150)."""
    scene, state = _smoke_scene()
    ex = exporters.FrameExporter(scene, str(tmp_path / "out"),
                                 export_ply=True, export_frame=True)
    ex.dump(state, 7)
    fd = tmp_path / "out" / "000007"
    ply = fd / "particle_object_0.ply"
    assert ply.exists() and (fd / "raw_view.png").exists()
    pts = exporters.read_ply(str(ply))
    assert len(pts) == 1300
    png = (fd / "raw_view.png").read_bytes()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_scene_explicit_zero_viscosity(tmp_path):
    """Explicit 0.0 must not fall back to a default (falsy-zero bug class)."""
    spec = json.load(open(os.path.join(SCENES, "smoke_test.json")))
    spec["Configuration"]["viscosity"] = 0.0
    path = tmp_path / "zero_visc.json"
    path.write_text(json.dumps(spec))
    scene, _ = load_scene(str(path))
    assert scene.params.viscosity == 0.0


SCENES_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "scenes")


@pytest.mark.parametrize("scene_json", sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(SCENES_DIR, "*.json"))))
def test_scene_library_loads(scene_json):
    """Every shipped scene must at least build params + a seeded state.

    Mesh-based scenes resolve geometry through SPH_ASSET_ROOT and voxelize
    on the host (minutes for the dragon meshes), so they are only checked
    for asset resolvability here, not fully instantiated."""
    import json as jsonlib
    path = os.path.join(SCENES_DIR, scene_json)
    with open(path) as f:
        doc = jsonlib.load(f)
    meshy = any(
        "geometryFile" in body
        for key in ("RigidBodies", "FluidBodies")
        for body in doc.get(key, []))
    if meshy:
        from sph_project_tpu.scene import _resolve_path
        for key in ("RigidBodies", "FluidBodies"):
            for body in doc.get(key, []):
                p = _resolve_path(body["geometryFile"])
                if not os.path.exists(p):
                    pytest.skip(f"mesh asset not available: {p}")
        pytest.skip("mesh voxelization is minutes-slow; load path covered "
                    "by test_rigid's OBJ scenes")
    if doc.get("Configuration", {}).get("totalTime", 0) and \
            scene_json == "large_scale_dfsph.json":
        pytest.skip("1.23M-particle host lattice is slow on one CPU core")
    scene, state = load_scene(path)
    assert scene.params.n_particles > 0
    import numpy as np
    assert np.isfinite(np.asarray(state.particles.pos)).all()
