"""Triangle-mesh utilities: OBJ I/O and procedural generators.

The BASELINE bunny config needs a ~70k-triangle mesh; this environment has no
network egress, so :func:`knot_mesh` synthesizes a comparable-complexity
closed mesh (a trefoil torus knot tube) at any triangle budget, and
:func:`load_obj`/:func:`save_obj` round-trip standard Wavefront files for
users with real assets.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def _native_lib():
    """Build/load the C++ OBJ loader (csrc/meshio.cpp); None if unavailable."""
    csrc = os.path.join(os.path.dirname(__file__), "..", "csrc")
    src = os.path.abspath(os.path.join(csrc, "meshio.cpp"))
    out = os.path.abspath(os.path.join(csrc, "build", "libmeshio.so"))
    try:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", src, "-o", out],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.obj_count.restype = ctypes.c_int
        lib.obj_load.restype = ctypes.c_int
        return lib
    except Exception:
        return None


def load_obj(path: str):
    """Wavefront OBJ reader: `v` and (triangulated) `f` records.

    Uses the native C++ loader (csrc/meshio.cpp) when available — ~50x faster
    on large meshes — with a pure-Python fallback. Faces with more than 3
    vertices are fan-triangulated; negative indices are supported. Returns
    ``(vertices (V,3) float64, faces (F,3) int64)``.
    """
    lib = _native_lib()
    if lib is not None:
        nv = ctypes.c_long()
        nf = ctypes.c_long()
        p = path.encode()
        if lib.obj_count(p, ctypes.byref(nv), ctypes.byref(nf)) == 0:
            verts = np.empty((nv.value, 3), np.float64)
            faces = np.empty((nf.value, 3), np.int64)
            if lib.obj_load(
                p,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            ) == 0:
                return verts, faces
    return _load_obj_py(path)


def _load_obj_py(path: str):
    """Pure-Python OBJ fallback."""
    verts = []
    faces = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def save_obj(path: str, vertices, faces) -> None:
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in np.asarray(faces):
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def grid_mesh(nu: int, nv: int, wrap_u: bool = True, wrap_v: bool = True):
    """Quad-grid triangulation indices for a (nu, nv) parameter grid."""
    faces = []
    umax = nu if wrap_u else nu - 1
    vmax = nv if wrap_v else nv - 1
    for i in range(umax):
        for j in range(vmax):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append([a, b, c])
            faces.append([a, c, d])
    return np.asarray(faces, np.int64)


def knot_mesh(n_tris: int = 70000, p: int = 2, q: int = 3, tube_radius: float = 0.35,
              scale: float = 1.0, center=(0.0, 0.0, 0.0), bumps: float = 0.06):
    """Closed (p,q)-torus-knot tube with ~``n_tris`` triangles and a surface
    displacement so normals vary like a scanned model — the stand-in for the
    Stanford bunny in BASELINE config 4.

    Returns ``(vertices (V,3), faces (F,3))``.
    """
    # n_tris = 2 * nu * nv; pick nu:nv ≈ 4:1 along the knot
    nv = max(int(np.sqrt(n_tris / 8)), 4)
    nu = max(n_tris // (2 * nv), 8)

    t = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    # knot centerline
    r = np.cos(q * t) + 2.0
    cx = r * np.cos(p * t)
    cy = r * np.sin(p * t)
    cz = -np.sin(q * t)
    cl = np.stack([cx, cy, cz], axis=1)

    # Frenet-ish frame via finite differences
    tang = np.roll(cl, -1, axis=0) - np.roll(cl, 1, axis=0)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    ref = np.asarray([0.0, 0.0, 1.0])
    nrm = np.cross(tang, ref)
    bad = np.linalg.norm(nrm, axis=1) < 1e-6
    nrm[bad] = np.cross(tang[bad], [0.0, 1.0, 0.0])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    bin_ = np.cross(tang, nrm)

    s = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    cos_s, sin_s = np.cos(s), np.sin(s)
    # bumpy tube radius (deterministic displacement)
    rad = tube_radius * (
        1.0
        + bumps * np.sin(7 * t)[:, None] * np.cos(5 * s)[None, :]
        + bumps * np.cos(11 * t)[:, None] * np.sin(3 * s)[None, :]
    )
    pts = (
        cl[:, None, :]
        + rad[..., None] * (cos_s[None, :, None] * nrm[:, None, :]
                            + sin_s[None, :, None] * bin_[:, None, :])
    )
    verts = pts.reshape(-1, 3)
    # normalize into a unit-ish box, then place
    lo, hi = verts.min(0), verts.max(0)
    verts = (verts - (lo + hi) / 2) / (hi - lo).max() * 2.0 * scale + np.asarray(center)
    return verts, grid_mesh(nu, nv)


def icosphere(subdivisions: int = 3, radius: float = 1.0, center=(0.0, 0.0, 0.0)):
    """Subdivided icosahedron (20·4^n triangles)."""
    phi = (1 + np.sqrt(5)) / 2
    verts = np.asarray(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        np.float64,
    )
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdivisions):
        edge_mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                verts.append((np.asarray(verts[a]) + np.asarray(verts[b])) / 2)
                edge_mid[key] = len(verts) - 1
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.asarray(verts)

    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return verts + np.asarray(center), faces
