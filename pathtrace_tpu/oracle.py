"""ctypes bridge to the native C++ parity oracle (csrc/oracle.cpp).

The oracle is the framework's independent implementation of the reference
estimator (scalar, recursive, f64) used to validate the TPU wavefront renderer
statistically. Built on demand with g++ (no pybind11 in this environment);
OpenMP-parallel over pixels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

from .models.camera import Camera
from .models.scene import Scene

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")

INTEGRATOR_CODES = {"brdf_only": 0, "nee": 1, "mis": 2}


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    src = os.path.abspath(os.path.join(_CSRC, "oracle.cpp"))
    out = os.path.abspath(os.path.join(_CSRC, "build", "liboracle.so"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp", src, "-o", out],
            check=True,
        )
    lib = ctypes.CDLL(out)
    lib.pt_render.restype = None
    return lib


def _f64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float64)


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def render_oracle(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    seed: int = 0,
) -> np.ndarray:
    """Render with the native oracle; returns (H, W, 3) mean pre-gamma radiance."""
    lib = _lib()

    tri_v0 = _f64(scene.tri_v0)[: max(scene.num_tris, 0)]
    tri_e1 = _f64(scene.tri_e1)[: max(scene.num_tris, 0)]
    tri_e2 = _f64(scene.tri_e2)[: max(scene.num_tris, 0)]
    tri_mat = _i32(scene.tri_mat)[: max(scene.num_tris, 0)]
    sph_c = _f64(scene.sph_center)[: max(scene.num_spheres, 0)]
    sph_r = _f64(scene.sph_radius)[: max(scene.num_spheres, 0)]
    sph_mat = _i32(scene.sph_mat)[: max(scene.num_spheres, 0)]

    mat_kind = _i32(scene.mat_kind)
    mat_color = _f64(scene.mat_color)
    mat_emission = _f64(scene.mat_emission)
    mat_rough = _f64(scene.mat_roughness)
    mat_metal = _f64(scene.mat_metallic)
    mat_ior = _f64(scene.mat_ior)
    lights = _i32(scene.light_prims)[: max(scene.num_lights, 0)]

    cam = np.concatenate(
        [
            _f64(camera.origin),
            _f64(camera.lower_left_corner),
            _f64(camera.horizontal),
            _f64(camera.vertical),
        ]
    )
    out = np.zeros((height, width, 3), dtype=np.float64)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib.pt_render(
        p(tri_v0), p(tri_e1), p(tri_e2), p(tri_mat), ctypes.c_int(scene.num_tris),
        p(sph_c), p(sph_r), p(sph_mat), ctypes.c_int(scene.num_spheres),
        p(mat_kind), p(mat_color), p(mat_emission), p(mat_rough), p(mat_metal),
        p(mat_ior), ctypes.c_int(int(mat_kind.shape[0])),
        p(lights), ctypes.c_int(scene.num_lights),
        p(cam),
        ctypes.c_int(width), ctypes.c_int(height), ctypes.c_int(spp),
        ctypes.c_int(INTEGRATOR_CODES[integrator]), ctypes.c_ulonglong(seed),
        p(out),
    )
    return out


def render_oracle_window(
    scene: Scene,
    camera: Camera,
    full_width: int,
    full_height: int,
    x0: int,
    y0: int,
    win_w: int,
    win_h: int,
    spp: int,
    integrator: str = "mis",
    seed: int = 0,
) -> np.ndarray:
    """Oracle render of a sub-rectangle of a ``full_width x full_height``
    frame — bitwise equal to the same region of the full render (per-pixel
    seeding and u/v mapping use global coordinates). Returns (win_h, win_w, 3).

    This makes single-pixel ground-truth anchors affordable: the reference's
    own debugging methodology is per-pixel replay (world.rs:377-478), and a
    full 400x400 oracle pass per assertion would be minutes on one core."""
    lib = _lib()
    lib.pt_render_window.restype = None

    tri_v0 = _f64(scene.tri_v0)[: max(scene.num_tris, 0)]
    tri_e1 = _f64(scene.tri_e1)[: max(scene.num_tris, 0)]
    tri_e2 = _f64(scene.tri_e2)[: max(scene.num_tris, 0)]
    tri_mat = _i32(scene.tri_mat)[: max(scene.num_tris, 0)]
    sph_c = _f64(scene.sph_center)[: max(scene.num_spheres, 0)]
    sph_r = _f64(scene.sph_radius)[: max(scene.num_spheres, 0)]
    sph_mat = _i32(scene.sph_mat)[: max(scene.num_spheres, 0)]
    mat_kind = _i32(scene.mat_kind)
    mat_color = _f64(scene.mat_color)
    mat_emission = _f64(scene.mat_emission)
    mat_rough = _f64(scene.mat_roughness)
    mat_metal = _f64(scene.mat_metallic)
    mat_ior = _f64(scene.mat_ior)
    lights = _i32(scene.light_prims)[: max(scene.num_lights, 0)]
    cam = np.concatenate(
        [
            _f64(camera.origin),
            _f64(camera.lower_left_corner),
            _f64(camera.horizontal),
            _f64(camera.vertical),
        ]
    )
    out = np.zeros((win_h, win_w, 3), dtype=np.float64)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib.pt_render_window(
        p(tri_v0), p(tri_e1), p(tri_e2), p(tri_mat), ctypes.c_int(scene.num_tris),
        p(sph_c), p(sph_r), p(sph_mat), ctypes.c_int(scene.num_spheres),
        p(mat_kind), p(mat_color), p(mat_emission), p(mat_rough), p(mat_metal),
        p(mat_ior), ctypes.c_int(int(mat_kind.shape[0])),
        p(lights), ctypes.c_int(scene.num_lights),
        p(cam),
        ctypes.c_int(full_width), ctypes.c_int(full_height),
        ctypes.c_int(x0), ctypes.c_int(y0),
        ctypes.c_int(win_w), ctypes.c_int(win_h),
        ctypes.c_int(spp),
        ctypes.c_int(INTEGRATOR_CODES[integrator]), ctypes.c_ulonglong(seed),
        p(out),
    )
    return out
