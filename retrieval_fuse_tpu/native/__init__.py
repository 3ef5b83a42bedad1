"""Native (C++) components with ctypes bindings.

Builds lazily with g++ on first use; the compiled .so is cached next to the
source. Components:
  * marching_cubes: host isosurface extraction (counterpart of the
    reference's marching_cubes C++ extension, util/visualization.py:1);
  * compose_paste: distance-priority patch pasting for the offline compose
    stage (hot host loop of util/retrieval.py:145-164).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent
_LIB_PATH = _NATIVE_DIR / "libretrievalfuse_native.so"
_SOURCES = ["marching_cubes.cpp", "compose.cpp", "voxelize.cpp"]

_lib = None


def _build() -> Path:
    srcs = [str(_NATIVE_DIR / s) for s in _SOURCES]
    newest_src = max(Path(s).stat().st_mtime for s in srcs)
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= newest_src:
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           *srcs, "-o", str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.mc_extract.restype = ctypes.c_int
        lib.mc_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mc_extract_classic.restype = ctypes.c_int
        lib.mc_extract_classic.argtypes = lib.mc_extract.argtypes
        lib.mc_free.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.voxelize_mesh.restype = None
        lib.voxelize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.compose_paste.restype = None
        lib.compose_paste.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def marching_cubes(sdf: np.ndarray, level: float, method: str = "mc"):
    """Isosurface of a 3-D float grid at `level` -> (verts (V,3) f32, tris (T,3) i32).

    Vertex coordinates are in voxel-index units (same convention as the
    reference's mc.marching_cubes). method:
      'mc'   classic marching-cubes lookup-table triangulation (the
             reference extension's algorithm — the parity default);
      'tets' marching tetrahedra — identical isosurface, ~2x finer
             tessellation (kept for comparison / as the r1-r4 behavior).
    Both are watertight with outward normals (tests/test_mesh_deviation.py).
    """
    sdf = np.ascontiguousarray(sdf, dtype=np.float32)
    assert sdf.ndim == 3
    assert method in ("mc", "tets"), method
    lib = get_lib()
    extract = lib.mc_extract_classic if method == "mc" else lib.mc_extract
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    n_v = ctypes.c_int()
    n_t = ctypes.c_int()
    rc = extract(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sdf.shape[0], sdf.shape[1], sdf.shape[2], ctypes.c_float(level),
        ctypes.byref(verts_p), ctypes.byref(n_v), ctypes.byref(tris_p), ctypes.byref(n_t))
    if rc != 0:
        raise RuntimeError(f"mc_extract failed with code {rc}")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(n_v.value, 3)).copy() if n_v.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tris_p, shape=(n_t.value, 3)).copy() if n_t.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(verts_p, tris_p)
    return verts, tris


def export_obj(verts: np.ndarray, tris: np.ndarray, path) -> None:
    """Write an OBJ file (counterpart of the reference's mc.export_obj)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def voxelize_mesh(verts: np.ndarray, tris: np.ndarray, pitch: float,
                  origin_cell: np.ndarray, dims: tuple[int, int, int]) -> np.ndarray:
    """Exact shell voxelization: (nx, ny, nz) uint8 grid with 1 in every cell
    whose box intersects a triangle. `origin_cell` is the integer cell index
    of the grid's (0,0,0) cell; cell c of the returned grid is world cell
    origin_cell + c (i.e. world box [(origin_cell+c)·pitch, +pitch))."""
    verts = np.ascontiguousarray(
        np.asarray(verts, np.float64) / pitch - np.asarray(origin_cell, np.float64),
        np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    grid = np.zeros(dims, np.uint8)
    if len(tris):
        lib = get_lib()
        lib.voxelize_mesh(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), verts.shape[0],
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), tris.shape[0],
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dims[0], dims[1], dims[2])
    return grid


def compose_paste(volume: np.ndarray, distances: np.ndarray, crops: np.ndarray,
                  extents: np.ndarray, dists: np.ndarray, no_overlap: bool) -> None:
    """In-place distance-priority paste of P crops into a scene volume.

    volume/distances: (X, Y, Z) f32 C-contiguous (mutated);
    crops: (P, ps, ps, ps) f32; extents: (P, 6) i32; dists: (P,) f32.
    """
    lib = get_lib()
    assert volume.flags.c_contiguous and distances.flags.c_contiguous
    crops = np.ascontiguousarray(crops, np.float32)
    extents = np.ascontiguousarray(extents, np.int32)
    dists = np.ascontiguousarray(dists, np.float32)
    ps = crops.shape[1]
    lib.compose_paste(
        volume.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        distances.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        volume.shape[0], volume.shape[1], volume.shape[2],
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        extents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        crops.shape[0], ps, 1 if no_overlap else 0)
