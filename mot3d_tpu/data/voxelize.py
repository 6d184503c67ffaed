"""Mesh voxelization + point-in-mesh: ctypes over native/voxelize (C++).

Replaces the reference's vendored `BlenderProc/utils/libvoxelize` (tri-box
SAT voxelizer), `libmesh/triangle_hash` (2D triangle buckets) and
`voxels.py` VoxelGrid helpers — the offline preprocessing that regenerates
CAD voxel caches.  NumPy fallbacks keep everything usable without the .so.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "lib", "libvoxelize.so")
_lib: Optional[ctypes.CDLL] = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        _lib.tri_box_overlap.restype = ctypes.c_int
    except OSError:  # pragma: no cover
        _lib = None


def tri_box_overlap(box_center, box_half, triangle) -> bool:
    """Akenine-Moller separating-axis triangle/AABB test."""
    c = np.ascontiguousarray(box_center, np.float64)
    h = np.ascontiguousarray(box_half, np.float64)
    t = np.ascontiguousarray(triangle, np.float64).reshape(9)
    if _lib is not None:
        return bool(_lib.tri_box_overlap(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double))))
    return _tri_box_overlap_np(c, h, t.reshape(3, 3))


def _tri_box_overlap_np(c, h, tri) -> bool:
    v = tri - c
    # box axes
    for a in range(3):
        if v[:, a].min() > h[a] or v[:, a].max() < -h[a]:
            return False
    # triangle plane
    e = np.array([v[1] - v[0], v[2] - v[1], v[0] - v[2]])
    n = np.cross(e[0], e[1])
    if abs(np.dot(n, v[0])) > np.abs(n) @ h:
        return False
    # 9 cross axes
    units = np.eye(3)
    for i in range(3):
        for j in range(3):
            axis = np.cross(units[j], e[i])
            p = v @ axis
            rad = np.abs(axis) @ h
            if p.min() > rad or p.max() < -rad:
                return False
    return True


def voxelize_surface(vertices: np.ndarray, faces: np.ndarray,
                     resolution: int = 32) -> np.ndarray:
    """Surface-voxelize a mesh given in unit-cube coords [0, 1]^3.

    vertices (V, 3); faces (F, 3) int.  Returns (res, res, res) bool grid.
    """
    tris = np.ascontiguousarray(
        vertices[np.asarray(faces, np.int64)], np.float64)  # (F, 3, 3)
    grid = np.zeros(resolution ** 3, np.uint8)
    if _lib is not None:
        _lib.voxelize_mesh(
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(tris)), ctypes.c_int64(resolution),
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return grid.reshape(resolution, resolution, resolution).astype(bool)
    cell = 1.0 / resolution
    g = grid.reshape(resolution, resolution, resolution)
    for tri in tris:
        lo = np.clip(np.floor(tri.min(0) * resolution).astype(int), 0,
                     resolution - 1)
        hi = np.clip(np.floor(tri.max(0) * resolution).astype(int), 0,
                     resolution - 1)
        for i in range(lo[0], hi[0] + 1):
            for j in range(lo[1], hi[1] + 1):
                for k in range(lo[2], hi[2] + 1):
                    if g[i, j, k]:
                        continue
                    centre = (np.array([i, j, k]) + 0.5) * cell
                    if _tri_box_overlap_np(centre, np.full(3, cell / 2), tri):
                        g[i, j, k] = 1
    return g.astype(bool)


def points_in_mesh(vertices: np.ndarray, faces: np.ndarray,
                   points: np.ndarray, grid_res: int = 64) -> np.ndarray:
    """Ray-parity point-in-mesh test (+Z stabbing with 2D triangle buckets).

    Mirrors `BlenderProc/utils/libmesh/inside_mesh.py:5-154`.
    """
    v = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int32)
    p = np.ascontiguousarray(points, np.float64)
    out = np.zeros(len(p), np.uint8)
    if _lib is not None:
        _lib.points_in_mesh(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(v)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(f)),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(p)), ctypes.c_int64(grid_res),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)
    # NumPy fallback: brute-force over triangles.  Queries are nudged by a
    # tiny incommensurate offset so rays never pass exactly through shared
    # triangle edges (double-count would flip the parity).
    tris = v[f]
    ext = v.max(0) - v.min(0) + 1e-12
    p = p + np.array([1.3719e-7 * ext[0], 0.7129e-7 * ext[1], 0.0])
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    d = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
         + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    inside = np.zeros(len(p), bool)
    for i, pt in enumerate(p):
        with np.errstate(divide="ignore", invalid="ignore"):
            l1 = ((b[:, 1] - c[:, 1]) * (pt[0] - c[:, 0])
                  + (c[:, 0] - b[:, 0]) * (pt[1] - c[:, 1])) / d
            l2 = ((c[:, 1] - a[:, 1]) * (pt[0] - c[:, 0])
                  + (a[:, 0] - c[:, 0]) * (pt[1] - c[:, 1])) / d
        l3 = 1 - l1 - l2
        hit = (l1 >= 0) & (l2 >= 0) & (l3 >= 0) & (np.abs(d) > 1e-15)
        z = l1 * a[:, 2] + l2 * b[:, 2] + l3 * c[:, 2]
        inside[i] = ((z[hit] > pt[2]).sum() % 2) == 1
    return inside


def voxelize_fill(vertices: np.ndarray, faces: np.ndarray,
                  resolution: int = 32) -> np.ndarray:
    """Solid voxelization: surface + interior fill via point-in-mesh
    (`BlenderProc/utils/voxels.py` voxelize_fill/interior semantics)."""
    surf = voxelize_surface(vertices, faces, resolution)
    centres = (np.stack(np.meshgrid(*[np.arange(resolution)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3)
               + 0.5) / resolution
    inside = points_in_mesh(vertices, faces, centres).reshape(surf.shape)
    return np.logical_or(surf, inside)
