"""Light sampling for next-event estimation and MIS pdf queries.

Vectorized counterpart of ``World::sample_light_point`` (world.rs:251-267) and
``Shape::sample_surface_from_point`` (shape.rs:91-145 sphere cone sampling,
shape.rs:200-241 triangle area sampling). Each ray picks one light uniformly;
both shape lanes are computed branchlessly and selected per ray.

Implementation note: per-light geometry comes from the scene's packed
``light_geom`` table via a one-hot (N,L)@(L,17) product — a single MXU pass
replacing ~10 serialized TPU gathers (measured ~2 ms each at production wave
sizes). One-hot rows make the product exact, so CPU parity tests see identical
values to direct indexing.

Reference quirk preserved on purpose (required for RMSE parity, SURVEY §3.2):
the NEE-side pdf is divided by the light count (world.rs:260) but the MIS
bsdf-side pdf query is **not** (rendering.rs:114-117) — so
:func:`sample_light_point` divides and :func:`light_pdf_toward` does not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models.scene import Scene
from ..utils import vec

_PI = jnp.pi


@struct.dataclass
class LightSample:
    point: jnp.ndarray     # (N, 3) sampled point on the light
    normal: jnp.ndarray    # (N, 3) light-surface normal
    emission: jnp.ndarray  # (N, 3)
    pdf: jnp.ndarray       # (N,) solid-angle pdf ÷ num_lights
    dir: jnp.ndarray       # (N, 3) unit direction from the shading point
    dist: jnp.ndarray      # (N,)


def _rows_from_onehot(scene: Scene, onehot):
    """(N, L) one-hot → (N, 17) packed light rows (exact: single 1 per row)."""
    return jnp.dot(
        onehot.astype(scene.light_geom.dtype),
        scene.light_geom,
        preferred_element_type=scene.light_geom.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _tri_lane_rows(row, from_point, target_point, r1, r2):
    """Triangle surface sample / pdf toward a target (shape.rs:200-241)."""
    v0 = row[:, 1:4]
    e1 = row[:, 4:7]
    e2 = row[:, 7:10]
    normal = row[:, 10:13]
    area = row[:, 13]

    if target_point is None:
        sqrt_r1 = jnp.sqrt(r1)
        u = 1.0 - sqrt_r1
        v = r2 * sqrt_r1
        point = v0 + e1 * u[:, None] + e2 * v[:, None]
    else:
        point = target_point

    to_light = point - from_point
    d = vec.length(to_light)
    ldir = to_light / jnp.where(d > 0, d, 1.0)[:, None]
    # |n·(-ldir)| — two-sided emitters (shape.rs:231)
    cos_light = jnp.abs(vec.dot(normal, -ldir))
    pdf_area = 1.0 / jnp.maximum(area, 1e-20)
    pdf_omega = jnp.where(
        cos_light > 1e-8, pdf_area * (d * d) / jnp.maximum(cos_light, 1e-8), 1e-8
    )
    return point, normal, pdf_omega, ldir, d


def _sphere_lane_rows(row, from_point, target_point, r1, r2):
    """Sphere cone sample / pdf (shape.rs:91-145): uniform direction in the
    subtended cone, constant pdf 1/solid_angle; the sampled point is found by
    re-intersecting the cone ray with the sphere."""
    center = row[:, 1:4]
    radius = row[:, 4]

    to_center = center - from_point
    dist_sq = vec.dot(to_center, to_center)
    sin2_max = (radius * radius) / jnp.where(dist_sq > 0, dist_sq, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    solid_angle = 2.0 * _PI * (1.0 - cos_max)
    pdf_omega = 1.0 / jnp.maximum(solid_angle, 1e-12)

    if target_point is None:
        cos_theta = 1.0 - r1 + r1 * cos_max
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        phi = 2.0 * _PI * r2

        w = vec.normalize(to_center)
        # Same up-fallback convention as the reference (shape.rs:119-123).
        up = jnp.where(
            (jnp.abs(w[..., 1]) > 0.999)[..., None],
            jnp.asarray([1.0, 0.0, 0.0], w.dtype),
            jnp.asarray([0.0, 1.0, 0.0], w.dtype),
        )
        u = vec.normalize(vec.cross(up, w))
        v = vec.cross(w, u)
        direction = (
            u * (sin_theta * jnp.cos(phi))[:, None]
            + v * (sin_theta * jnp.sin(phi))[:, None]
            + w * cos_theta[:, None]
        )
        direction = vec.normalize(direction)

        oc = from_point - center
        a = vec.dot(direction, direction)
        half_b = vec.dot(oc, direction)
        c = vec.dot(oc, oc) - radius * radius
        disc = half_b * half_b - a * c
        t = (-half_b - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
        point = from_point + direction * t[:, None]
    else:
        point = target_point

    normal = vec.normalize(point - center)
    to_light = point - from_point
    d = vec.length(to_light)
    ldir = to_light / jnp.where(d > 0, d, 1.0)[:, None]
    return point, normal, pdf_omega, ldir, d


def _select_lanes(row, from_point, target_point, r1, r2):
    tp, tn, tpdf, tdir, td = _tri_lane_rows(row, from_point, target_point, r1, r2)
    sp, sn, spdf, sdir, sd = _sphere_lane_rows(row, from_point, target_point, r1, r2)
    is_tri = row[:, 0] > 0.5
    it = is_tri[:, None]
    return (
        jnp.where(it, tp, sp),
        jnp.where(it, tn, sn),
        jnp.where(is_tri, tpdf, spdf),
        jnp.where(it, tdir, sdir),
        jnp.where(is_tri, td, sd),
    )


def sample_light_point(scene: Scene, from_point, u_sel, r1, r2) -> LightSample:
    """Uniformly pick a light and sample its surface (world.rs:251-267).
    The returned pdf includes the 1/num_lights factor (world.rs:260)."""
    num_lights = max(scene.num_lights, 1)
    l_rows = scene.light_geom.shape[0]
    idx = jnp.minimum((u_sel * num_lights).astype(jnp.int32), num_lights - 1)
    onehot = idx[:, None] == jnp.arange(l_rows, dtype=jnp.int32)[None, :]
    row = _rows_from_onehot(scene, onehot)

    point, normal, pdf, ldir, dist = _select_lanes(row, from_point, None, r1, r2)
    return LightSample(
        point=point,
        normal=normal,
        emission=row[:, 14:17],
        pdf=pdf / num_lights,
        dir=ldir,
        dist=dist,
    )


def light_pdf_toward(scene: Scene, prim, from_point, target_point):
    """Solid-angle pdf of the shape sampler toward a known hit point — the MIS
    bsdf-side query (rendering.rs:114-117). NOT divided by the light count
    (the reference quirk). ``prim`` rows that are not lights produce a
    harmless bogus pdf; callers mask on the hit being emissive."""
    onehot = prim[:, None] == scene.light_prims[None, :]
    row = _rows_from_onehot(scene, onehot)
    _, _, pdf, _, _ = _select_lanes(row, from_point, target_point, None, None)
    return pdf
