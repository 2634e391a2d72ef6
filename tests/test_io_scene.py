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


def test_checkpoint_forward_compat_new_field(tmp_path):
    """A checkpoint written before a state field existed restores into the
    newer template: the missing leaf keeps the template's value (warned),
    everything else matches by name. Exercises the dfsph_kappa_v-style
    state evolution path."""
    import os
    import jax
    scene, state = _smoke_scene()
    # simulate an OLD checkpoint: drop one named leaf from the saved file
    names, vals, _ = checkpoint._flatten_with_names(state)
    drop = next(i for i, n in enumerate(names) if "dfsph_kappa_v" in n)
    arrays = {f"leaf_{i}": np.asarray(v)
              for i, v in enumerate(vals[:drop] + vals[drop + 1:])}
    os.makedirs(str(tmp_path / "oldck"), exist_ok=True)
    np.savez_compressed(
        os.path.join(str(tmp_path / "oldck"), "state.npz"),
        __names__=np.asarray(names[:drop] + names[drop + 1:], dtype=object),
        **arrays)
    with pytest.warns(UserWarning, match="dfsph_kappa_v"):
        restored = checkpoint.restore(str(tmp_path / "oldck"), state)
    for (n, a), b in zip(
            zip(names, jax.tree_util.tree_leaves(restored)),
            jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


# scenes whose host build takes >30s on one CPU core (2.25M lattice with 97%
# domain-box walls; 771k fluid + 9 mesh voxelizations); every other shipped
# scene instantiates in <10s
_HEAVY_SCENES = {"buckling_emitter.json", "coupling_nine_rigid.json"}

# golden per-scene fluid counts anchoring parity with the reference's demo
# arithmetic (derived from /root/reference/data/scenes/*.json block dims at
# spacing 2r; see BASELINE.md): a lattice or loader drift breaks these
_GOLDEN_FLUID = {
    "large_scale_dfsph.json": 1_231_200,   # final_scene0's fluid block
    "dragon_bath_dfsph.json": 321_750,     # dragon_bath block (SURVEY §6)
}


@pytest.mark.parametrize("scene_json", sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(SCENES_DIR, "*.json"))),
)
def test_scene_library_loads(scene_json):
    """Every shipped scene fully instantiates: params, mesh voxelization,
    wall shells, and a seeded finite state. Headline scenes must also hit
    their golden fluid counts (reference-parity anchors)."""
    if scene_json in _HEAVY_SCENES:
        pytest.skip("heavy host lattice; covered by the slow tier")
    _instantiate_and_check(scene_json)


@pytest.mark.slow
@pytest.mark.parametrize("scene_json", sorted(_HEAVY_SCENES))
def test_scene_library_loads_heavy(scene_json):
    _instantiate_and_check(scene_json)


def _instantiate_and_check(scene_json):
    import json as jsonlib
    path = os.path.join(SCENES_DIR, scene_json)
    with open(path) as f:
        doc = jsonlib.load(f)
    from sph_project_tpu.scene import _resolve_path
    for key in ("RigidBodies", "FluidBodies"):
        for body in doc.get(key, []):
            try:
                _resolve_path(body["geometryFile"])
            except FileNotFoundError:
                pytest.skip(f"mesh asset not available: {body['geometryFile']}")
    scene, state = load_scene(path)
    assert scene.params.n_particles > 0
    mat = np.asarray(state.particles.material)
    pos = np.asarray(state.particles.pos)
    active = mat != 0
    # entry-deferred scenes (emitters) may seed everything as NONE
    if active.any():
        assert np.isfinite(pos[active]).all()
        lo = np.asarray(scene.params.domain_start) - 1e-5
        hi = np.asarray(scene.params.domain_end) + 1e-5
        assert (pos[active] >= lo).all() and (pos[active] <= hi).all()
    golden = _GOLDEN_FLUID.get(scene_json)
    if golden is not None:
        n_fluid = sum(o.particle_num for o in scene.objects
                      if o.material == MATERIAL_FLUID)
        assert n_fluid == golden, f"fluid count {n_fluid} != golden {golden}"


def test_fluid_bodies_scene_instantiates_and_runs(tmp_path):
    """FluidBodies: fluid seeded from a mesh volume (the final_scene2 class;
    reference fill path base_container.py:676-717). A small OBJ cube of fluid
    must voxelize to a full lattice, load, and survive a few DFSPH steps."""
    from test_rigid import write_cube_obj
    from sph_project_tpu import sim as simlib

    cube = write_cube_obj(str(tmp_path / "cube.obj"), size=0.12)
    spec = {
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.5, 0.5, 0.5],
            "addDomainBox": False, "particleRadius": 0.01, "density0": 1000,
            "gravitation": [0, -9.81, 0], "simulationMethod": "dfsph",
            "viscosityMethod": "standard", "timeStepSize": 1e-3,
            "viscosity": 0.05},
        "FluidBodies": [{
            "objectId": 0, "geometryFile": cube,
            "translation": [0.25, 0.1, 0.25], "rotationAxis": [0, 1, 0],
            "rotationAngle": 0, "scale": [1, 1, 1],
            "velocity": [0, 0, 0], "density": 1000.0,
            "color": [50, 100, 200], "entryTime": -1.0}],
    }
    path = tmp_path / "fluid_body.json"
    path.write_text(json.dumps(spec))
    scene, state = load_scene(str(path))
    mat = np.asarray(state.particles.material)
    n_fluid = int((mat == MATERIAL_FLUID).sum())
    # a 0.12 cube at spacing 0.02 holds a 5-7^3 interior lattice depending on
    # surface-offset handling; it must be a solid fill, not a shell
    assert 125 <= n_fluid <= 343, f"unexpected mesh fill count {n_fluid}"
    sim = simlib.Simulation(scene, state)
    for _ in range(3):
        diag = sim.step()
    assert np.isfinite(np.asarray(sim.state.particles.pos)).all()
    assert float(diag["density_max"]) < 1300.0


def test_builtin_models_resolve_without_reference(monkeypatch, tmp_path):
    """Self-containment (VERDICT r4 missing #1): every mesh asset the shipped
    scenes name must resolve to the first-party procedural stand-ins
    (data/models_builtin, generated by data/make_models.py) when the
    reference checkout is absent, and a mesh scene must fully instantiate
    from them."""
    import json as jsonlib
    import glob as globlib
    import sph_project_tpu.scene as scene_mod

    monkeypatch.setattr(scene_mod, "ASSET_ROOT", str(tmp_path / "absent"))
    monkeypatch.chdir(tmp_path)  # break the literal ./data/... path too
    needed = set()
    for p in globlib.glob(os.path.join(SCENES_DIR, "*.json")):
        with open(p) as f:
            doc = jsonlib.load(f)
        for key in ("RigidBodies", "FluidBodies"):
            for body in doc.get(key, []):
                needed.add(body["geometryFile"])
    assert needed, "expected mesh-based scenes in the library"
    for path in sorted(needed):
        resolved = scene_mod._resolve_path(path)
        assert "models_builtin" in resolved, (path, resolved)

    # a real mesh scene instantiates end-to-end from the stand-ins
    scene, state = load_scene(os.path.join(SCENES_DIR, "coupling_dfsph.json"))
    mat = np.asarray(state.particles.material)
    assert (mat == MATERIAL_FLUID).sum() > 0
    assert np.isfinite(np.asarray(state.particles.pos)[mat != 0]).all()


def test_invisible_objects_config_key(tmp_path):
    """Configuration.invisibleObjects (reference run_simulation.py:88) folds
    into the per-object visible flag, and the frame renderer drops those
    particles (their color stays zero so the vis mask excludes them)."""
    spec = json.load(open(os.path.join(SCENES, "smoke_test.json")))
    spec["Configuration"]["invisibleObjects"] = [0]
    path = tmp_path / "invis.json"
    path.write_text(json.dumps(spec))
    scene, state = load_scene(str(path))
    flags = {o.object_id: o.visible for o in scene.objects}
    assert flags[0] is False
    assert all(v for oid, v in flags.items() if oid != 0)

    ex = exporters.FrameExporter(scene, str(tmp_path / "out"),
                                 export_frame=True)
    ex.dump(state, 0)
    png = tmp_path / "out" / "000000" / "raw_view.png"
    assert png.exists()
    # with the only fluid object invisible the rendered view carries no
    # fluid pixels: compare against a visible render of the same state
    scene2, state2 = load_scene(str(tmp_path / "invis.json"))
    for o in scene2.objects:
        o.visible = True
    ex2 = exporters.FrameExporter(scene2, str(tmp_path / "out2"),
                                  export_frame=True)
    ex2.dump(state2, 0)
    assert png.stat().st_size < (tmp_path / "out2" / "000000" /
                                 "raw_view.png").stat().st_size
