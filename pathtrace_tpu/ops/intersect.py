"""Batched ray–scene intersection.

The reference intersects by a linear scan of boxed trait objects keeping the
closest hit (world.rs:270-290). Here a whole wave of rays is tested against
tiles of the SoA primitive arrays with one broadcasted Möller–Trumbore /
half-b-quadratic expression per tile, reduced by a running argmin inside
``lax.scan`` — bounded VMEM footprint at any scene size, and the same API later
swaps in the Pallas/MXU kernels and the LBVH without touching callers.

Epsilon conventions are the reference's exactly: 1e-8 parallel reject
(shape.rs:168), closed ``[t_min, t_max]`` range tests (shape.rs:77-79, 190),
inclusive barycentric bounds ``0≤u≤1``, ``v≥0``, ``u+v≤1`` (shape.rs:176-184).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import struct

from ..models.scene import Scene
from ..utils import vec

_INF = jnp.inf


@struct.dataclass
class Hit:
    """SoA hit record for a wave of rays: the reference's ``Option<HitRecord>``
    (base.rs:5-34) with the miss encoded as ``prim == -1`` / ``t == inf``."""

    t: jnp.ndarray           # (N,)
    prim: jnp.ndarray        # (N,) int32 global prim id, -1 = miss
    point: jnp.ndarray       # (N, 3)
    normal: jnp.ndarray      # (N, 3) face-forwarded shading normal
    front_face: jnp.ndarray  # (N,) bool
    mat: jnp.ndarray         # (N,) int32 material id (undefined on miss)

    @property
    def valid(self) -> jnp.ndarray:
        return self.prim >= 0


def _round_tile(n: int, tile: int) -> int:
    return max(tile, ((n + tile - 1) // tile) * tile)


def _pad_rows(a: jnp.ndarray, rows: int, fill: float = 0.0) -> jnp.ndarray:
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, cfg, constant_values=fill)


def triangle_hit_ts(v0, e1, e2, o, d, t_min, t_max):
    """Möller–Trumbore over a full (N rays × T tris) broadcast
    (shape.rs:161-198). Returns hit distances ``(N, T)`` with inf for miss."""
    h = vec.cross(d[:, None, :], e2[None, :, :])            # (N,T,3)
    a = vec.dot(e1[None, :, :], h)                          # (N,T)
    s = o[:, None, :] - v0[None, :, :]
    f = 1.0 / a
    u = f * vec.dot(s, h)
    q = vec.cross(s, e1[None, :, :])
    v = f * vec.dot(d[:, None, :], q)
    t = f * vec.dot(e2[None, :, :], q)
    ok = (
        (jnp.abs(a) >= 1e-8)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    return jnp.where(ok, t, _INF)


def sphere_hit_ts(center, radius, o, d, t_min, t_max):
    """Half-b quadratic, nearest root in range else far root (shape.rs:53-89).
    Returns hit distances ``(N, S)`` with inf for miss."""
    oc = o[:, None, :] - center[None, :, :]                 # (N,S,3)
    a = vec.dot(d, d)[:, None]                              # (N,1)
    half_b = vec.dot(oc, d[:, None, :])                     # (N,S)
    c = vec.dot(oc, oc) - (radius * radius)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = (-half_b - sqrtd) / a
    root2 = (-half_b + sqrtd) / a
    live = (disc >= 0.0) & (radius > 0.0)[None, :]  # radius 0 marks padding rows
    ok1 = live & (root1 >= t_min) & (root1 <= t_max)
    ok2 = live & (root2 >= t_min) & (root2 <= t_max)
    return jnp.where(ok1, root1, jnp.where(ok2, root2, _INF))


def _closest_over_tiles(prim_arrays, hit_fn, o, d, t_min, t_max, tile, base_id):
    """Scan primitive tiles, carrying the running (closest t, prim id)."""
    n_rows = prim_arrays[0].shape[0]
    rows = _round_tile(n_rows, tile)
    tiles = [ _pad_rows(a, rows).reshape((rows // tile, tile) + a.shape[1:])
              for a in prim_arrays ]
    n = o.shape[0]

    def body(carry, xs):
        best_t, best_p = carry
        idx, arrs = xs
        ts = hit_fn(*arrs, o, d, t_min, jnp.minimum(t_max, best_t[:, None]))  # (N, tile)
        tmin_tile = jnp.min(ts, axis=1)
        arg = jnp.argmin(ts, axis=1).astype(jnp.int32)
        better = tmin_tile < best_t
        best_p = jnp.where(better, base_id + idx * tile + arg, best_p)
        best_t = jnp.where(better, tmin_tile, best_t)
        return (best_t, best_p), None

    init = (jnp.full((n,), _INF, o.dtype), jnp.full((n,), -1, jnp.int32))
    n_tiles = rows // tile
    if n_tiles == 1:
        (best_t, best_p), _ = body(init, (jnp.int32(0), [a[0] for a in tiles]))
        return best_t, best_p
    (best_t, best_p), _ = jax.lax.scan(
        body, init, (jnp.arange(n_tiles, dtype=jnp.int32), tiles)
    )
    return best_t, best_p


def intersect(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max,
    tile: int = 1024,
) -> Hit:
    """Closest hit for a wave of rays.

    ``t_min``/``t_max`` are scalars or per-ray ``(N,)`` arrays (shadow rays pass
    ``dist - 1e-3``, rendering.rs:62-65).
    """
    n = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, o.dtype), (n,))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, o.dtype), (n,))[:, None]

    tri_t, tri_p = _closest_over_tiles(
        (scene.tri_v0, scene.tri_e1, scene.tri_e2),
        triangle_hit_ts, o, d, t_min, t_max, min(tile, _round_tile(scene.tri_v0.shape[0], 8)), 0,
    )
    sph_t, sph_p = _closest_over_tiles(
        (scene.sph_center, scene.sph_radius),
        sphere_hit_ts, o, d, t_min, t_max, min(tile, _round_tile(scene.sph_center.shape[0], 8)),
        scene.tri_v0.shape[0],
    )

    sph_better = sph_t < tri_t
    t = jnp.where(sph_better, sph_t, tri_t)
    prim = jnp.where(sph_better, sph_p, tri_p)
    valid = prim >= 0

    point = o + d * jnp.where(valid, t, 0.0)[:, None]

    # Outward normal by primitive kind, then face-forward (base.rs:19-33).
    t_rows = scene.tri_v0.shape[0]
    is_tri = (prim >= 0) & (prim < t_rows)
    tri_idx = jnp.clip(prim, 0, t_rows - 1)
    sph_idx = jnp.clip(prim - t_rows, 0, scene.sph_center.shape[0] - 1)
    n_tri = scene.tri_normal[tri_idx]
    c = scene.sph_center[sph_idx]
    r = scene.sph_radius[sph_idx]
    n_sph = (point - c) / jnp.where(r > 0, r, 1.0)[:, None]
    outward = jnp.where(is_tri[:, None], n_tri, n_sph)

    front_face = vec.dot(d, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    mat = scene.prim_mat(jnp.maximum(prim, 0))

    return Hit(
        t=jnp.where(valid, t, _INF),
        prim=prim,
        point=point,
        normal=normal,
        front_face=front_face,
        mat=mat,
    )


def occluded(scene: Scene, o, d, t_min, t_max, tile: int = 1024) -> jnp.ndarray:
    """Boolean visibility test (shadow rays). Currently closest-hit based; an
    any-hit early-out is a later Pallas optimization."""
    return intersect(scene, o, d, t_min, t_max, tile=tile).valid
