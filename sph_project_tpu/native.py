"""ctypes bindings for the native components (native/libsphnative.so).

Builds on demand with the repo Makefile if the shared library is missing
(g++ is in the image; pybind11 is not, hence the plain C ABI).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsphnative.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.sph_density_grid.argtypes = [f32p, ctypes.c_int64, f32p, f32p, i32p,
                                     ctypes.c_float, ctypes.c_float, f32p]
    lib.sph_density_grid.restype = None
    lib.marching_tetrahedra.argtypes = [f32p, i32p, f32p, f32p, ctypes.c_float,
                                        f32p, ctypes.c_int64]
    lib.marching_tetrahedra.restype = ctypes.c_int64
    lib.mesh_inside.argtypes = [f64p, ctypes.c_int64, i64p, ctypes.c_int64,
                                f64p, ctypes.c_int64, u8p]
    lib.mesh_inside.restype = None
    _lib = lib
    return lib


def density_grid(pos: np.ndarray, origin, cell_size, dims,
                 support_radius: float, particle_volume: float) -> np.ndarray:
    lib = _load()
    pos = np.ascontiguousarray(pos, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    cell = np.ascontiguousarray(cell_size, np.float32)
    dims = np.ascontiguousarray(dims, np.int32)
    out = np.zeros(int(dims[0]) * int(dims[1]) * int(dims[2]), np.float32)
    lib.sph_density_grid(pos, pos.shape[0], origin, cell, dims,
                         support_radius, particle_volume, out)
    return out.reshape(dims[0], dims[1], dims[2])


def marching_tetrahedra(grid: np.ndarray, origin, cell_size,
                        iso: float, max_tris: int | None = None) -> np.ndarray:
    """Returns (T, 3, 3) float32 triangle soup."""
    lib = _load()
    dims = np.asarray(grid.shape, np.int32)
    g = np.ascontiguousarray(grid, np.float32).ravel()
    origin = np.ascontiguousarray(origin, np.float32)
    cell = np.ascontiguousarray(cell_size, np.float32)
    if max_tris is None:
        max_tris = int(grid.size) * 2 + 1024
    out = np.empty(max_tris * 9, np.float32)
    n = lib.marching_tetrahedra(g, dims, origin, cell, iso, out, max_tris)
    return out[: n * 9].reshape(int(n), 3, 3)


def mesh_inside(verts: np.ndarray, faces: np.ndarray,
                points: np.ndarray) -> np.ndarray:
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    points = np.ascontiguousarray(points, np.float64)
    out = np.zeros(points.shape[0], np.uint8)
    lib.mesh_inside(verts, verts.shape[0], faces, faces.shape[0],
                    points, points.shape[0], out)
    return out.astype(bool)


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
