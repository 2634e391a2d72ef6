"""Smoke tests for the first-party native pipeline (native/marching_cubes.cpp
via sph_project_tpu/native.py): density splat -> marching tetrahedra surface
reconstruction, and the mesh inside-test.

The reference's equivalent pipeline (splashsurf + Blender,
surface_reconstruction.py in jason-huang03/SPH_Project) was only ever
validated visually; these checks are geometric invariants instead: a sphere
particle cloud must reconstruct to a closed surface of the right size, and
the C++ inside-test must agree with the pure-python fill used at scene build.
"""
import numpy as np
import pytest

from sph_project_tpu import native

if not native.available():
    pytest.skip("native library unavailable (g++/make missing?)",
                allow_module_level=True)


def _sphere_cloud(radius=0.1, spacing=0.02):
    ax = np.arange(-radius, radius + spacing / 2, spacing)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    return g[np.linalg.norm(g, axis=1) <= radius].astype(np.float32)


def test_density_grid_peaks_inside_sphere():
    pts = _sphere_cloud()
    h = 0.04
    dims = np.array([24, 24, 24], np.int32)
    origin = np.array([-0.24, -0.24, -0.24], np.float32)
    grid = native.density_grid(pts, origin, [0.02, 0.02, 0.02], dims,
                               support_radius=h, particle_volume=0.8 * 0.02 ** 3)
    assert grid.shape == (24, 24, 24)
    assert np.isfinite(grid).all() and grid.min() >= 0.0
    # the grid is a NORMALIZED density (particle volume * kernel sums):
    # ~0.8 at a rest lattice interior, 0 far from any particle
    center = grid[12, 12, 12]
    corner = grid[0, 0, 0]
    assert center > 0.5, f"no density mass at sphere center: {center}"
    assert corner == 0.0, f"density leaked to the far corner: {corner}"


def test_marching_tetrahedra_reconstructs_sphere():
    pts = _sphere_cloud()
    h = 0.04
    cell = 0.02
    dims = np.array([26, 26, 26], np.int32)
    origin = np.full(3, -0.26, np.float32)
    grid = native.density_grid(pts, origin, [cell] * 3, dims,
                               support_radius=h, particle_volume=0.8 * 0.02 ** 3)
    tris = native.marching_tetrahedra(grid, origin, [cell] * 3, iso=0.45)
    assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
    assert tris.shape[0] > 100, f"too few triangles: {tris.shape[0]}"
    v = tris.reshape(-1, 3)
    assert np.isfinite(v).all()
    r = np.linalg.norm(v, axis=1)
    # surface vertices sit near the sphere radius (0.1), within the blur of
    # one support radius
    assert r.max() < 0.1 + h + cell
    assert np.median(r) > 0.05
    # watertight-ish: in a triangle soup from a closed isosurface every
    # (rounded) vertex position is shared by >= 3 triangles on average
    key = np.round(v / (cell / 16)).astype(np.int64)
    _, counts = np.unique(key, axis=0, return_counts=True)
    assert counts.mean() >= 3.0, f"open surface? mean vertex sharing {counts.mean()}"


def test_mesh_inside_agrees_with_python_fill():
    from test_rigid import write_cube_obj
    import tempfile, os
    from sph_project_tpu.geometry import mesh as meshlib

    with tempfile.TemporaryDirectory() as td:
        path = write_cube_obj(os.path.join(td, "cube.obj"), size=0.1)
        verts, faces = meshlib.load_obj(path)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.1, 0.1, size=(500, 3))
    inside_native = native.mesh_inside(verts, faces, pts)
    inside_true = np.all(np.abs(pts) < 0.05, axis=1)
    # surface-grazing points may legitimately differ; none of these random
    # points sit within 1e-6 of a face, so exact agreement is required
    on_surface = np.any(np.isclose(np.abs(pts), 0.05, atol=1e-6), axis=1)
    np.testing.assert_array_equal(inside_native[~on_surface],
                                  inside_true[~on_surface])
