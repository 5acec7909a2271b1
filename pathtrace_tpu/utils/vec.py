"""Batched 3-vector math over ``(..., 3)`` arrays.

TPU-native counterpart of the reference's scalar ``Vector3`` algebra
(``/root/reference/src/math.rs:3-136``): every helper is a pure, shape-polymorphic
``jnp`` function over structure-of-arrays batches so XLA fuses the whole
expression tree into vector (VPU) code. Branches in the reference
(``refract``'s total-internal-reflection ``Option``, ``face_forward``'s sign
test, the tangent-frame up-vector fallback) become masks / ``jnp.where``.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709 luminance weights (math.rs:133-135).
_LUM_R = 0.2126
_LUM_G = 0.7152
_LUM_B = 0.0722


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis (math.rs:24-26)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (math.rs:29-35)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length_squared(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize; zero vectors pass through unchanged (math.rs:48-51)."""
    len_ = length(a)[..., None]
    return jnp.where(len_ > 0.0, a / jnp.where(len_ > 0.0, len_, 1.0), a)


def normal_from_triangle(v0, v1, v2) -> jnp.ndarray:
    """Geometric normal of a triangle (math.rs:60-64)."""
    return normalize(cross(v1 - v0, v2 - v0))


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of an incident direction (math.rs:69-71)."""
    return incident - normal * (2.0 * dot(incident, normal))[..., None]


def refract(incident, normal, eta):
    """Snell refraction; returns ``(refracted, valid)`` where ``valid`` is False
    on total internal reflection. Masked analogue of the reference's
    ``Option``-returning ``refract`` (math.rs:77-88).

    ``eta`` is the IOR ratio n1/n2 and broadcasts against the batch.
    """
    eta = jnp.asarray(eta)
    cos_i = -dot(incident, normal)
    # (1-c)(1+c) rather than 1-c²: f32-stable near normal incidence.
    sin2_t = eta * eta * ((1.0 - cos_i) * (1.0 + cos_i))
    valid = sin2_t <= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refracted = incident * eta[..., None] + normal * (eta * cos_i - cos_t)[..., None]
    return refracted, valid


def face_forward(v: jnp.ndarray, ray_direction: jnp.ndarray) -> jnp.ndarray:
    """Flip ``v`` so it opposes ``ray_direction`` (math.rs:92-98)."""
    return jnp.where(dot(v, ray_direction)[..., None] < 0.0, v, -v)


def tangent_frame(normal: jnp.ndarray):
    """Build ``(tangent, bitangent)`` for a z-up-on-normal local frame.

    Replicates the reference's convention exactly — up is +Y unless
    ``|n.y| > 0.999``, in which case +X (math.rs:116-124, material.rs:112-119,
    mirror.rs:21-27) — so sampled directions have identical distributions.
    """
    ny = jnp.abs(normal[..., 1]) > 0.999
    up = jnp.where(
        ny[..., None],
        jnp.array([1.0, 0.0, 0.0], dtype=normal.dtype),
        jnp.array([0.0, 1.0, 0.0], dtype=normal.dtype),
    )
    tangent = normalize(cross(up, normal))
    bitangent = cross(normal, tangent)
    return tangent, bitangent


def from_tangent_frame(normal, tangent, bitangent, x, y, z):
    """Lift local coordinates ``(x, y, z)`` (z along the normal) to world space."""
    return tangent * x[..., None] + bitangent * y[..., None] + normal * z[..., None]


def uniform_hemisphere_direction(normal, r1, r2):
    """Uniform-hemisphere sample about ``normal`` (math.rs:101-126).

    ``r1, r2`` are uniforms in [0,1) supplied by the caller (counter-based RNG
    lives in :mod:`pathtrace_tpu.utils.rng`, not here).
    """
    phi = 2.0 * jnp.pi * r1
    cos_theta = r2
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    x = sin_theta * jnp.cos(phi)
    y = sin_theta * jnp.sin(phi)
    z = cos_theta
    tangent, bitangent = tangent_frame(normal)
    return normalize(from_tangent_frame(normal, tangent, bitangent, x, y, z))


def cosine_hemisphere_direction(normal, r1, r2):
    """Cosine-weighted hemisphere sample about ``normal`` (material.rs:93-122)."""
    phi = 2.0 * jnp.pi * r1
    cos_theta = jnp.sqrt(r2)
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    x = sin_theta * jnp.cos(phi)
    y = sin_theta * jnp.sin(phi)
    z = cos_theta
    tangent, bitangent = tangent_frame(normal)
    return normalize(from_tangent_frame(normal, tangent, bitangent, x, y, z))


def vmax(a: jnp.ndarray) -> jnp.ndarray:
    """Componentwise max of a 3-vector (math.rs:128-130)."""
    return jnp.max(a, axis=-1)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (math.rs:133-135)."""
    return _LUM_R * rgb[..., 0] + _LUM_G * rgb[..., 1] + _LUM_B * rgb[..., 2]


def finite_or_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Replace non-finite entries with zero.

    Vectorized analogue of the reference's NaN/∞ guards that return a
    zero BSDF when GGX math blows up at grazing angles (mirror.rs:258-265,
    292-300) — applied as a lane-wide scrub instead of an early return.
    """
    return jnp.where(jnp.isfinite(a), a, jnp.zeros_like(a))
