"""ctypes bindings for the native mesh library (csrc/marching_cubes.cpp).

Builds libndjir_native.so on first use if missing (g++ is baked into the
image); every entry point has a pure-numpy fallback assertion-tested against
the native path in tests/test_extract.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libndjir_native.so")
_lib = None


def _build() -> None:
    subprocess.run(["make", "-C", _CSRC], check=True,
                   capture_output=True, text=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_CSRC, "marching_cubes.cpp"))):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)

    lib.mc_run.restype = ctypes.c_int
    lib.mc_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_free.argtypes = [ctypes.c_void_p]
    lib.mesh_connected_components.restype = ctypes.c_int
    lib.mesh_connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int)]
    lib.sample_triangles.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def marching_cubes(field: np.ndarray, level: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """field (Gx, Gy, Gz) float32 -> (verts (V, 3) in voxel coords,
    tris (T, 3) int32)."""
    lib = get_lib()
    field = np.ascontiguousarray(field, np.float32)
    gx, gy, gz = field.shape
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mc_run(field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    gx, gy, gz, ctypes.c_float(level),
                    ctypes.byref(pv), ctypes.byref(pt),
                    ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError("mc_run failed (allocation)")
    try:
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(pt, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(pv)
        lib.mc_free(pt)
    return verts, tris


def connected_components(tris: np.ndarray, n_vertices: int) -> np.ndarray:
    """Per-triangle component labels (vertex connectivity)."""
    lib = get_lib()
    tris = np.ascontiguousarray(tris, np.int32)
    labels = np.zeros((len(tris),), np.int32)
    lib.mesh_connected_components(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tris),
        n_vertices, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return labels


def sample_surface(verts: np.ndarray, tris: np.ndarray, n_samples: int,
                   seed: int = 0) -> np.ndarray:
    """Area-weighted uniform samples on the mesh surface, (n, 3)."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    out = np.zeros((n_samples, 3), np.float32)
    lib.sample_triangles(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(tris), n_samples, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
