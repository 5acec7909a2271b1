"""Pinhole camera with fully vectorized jittered ray generation.

TPU-native counterpart of the reference camera (``/root/reference/src/camera.rs``):
instead of producing one ``Ray`` per call, :meth:`Camera.generate_rays` emits an
entire SoA wave of primary rays with one broadcasted expression, ready for the
wavefront integrator.

Two reference conventions are replicated deliberately for image parity:

* The FOV parameter is *named* horizontal but drives the **vertical** viewport
  (``viewport_height`` is derived from it and width = height × aspect,
  camera.rs:61-62). Harmless at square resolutions, visible at 16:9 — kept.
* Pixel coordinates map to the screen via ``u=(x+jx)/(width-1)`` (camera.rs:140),
  i.e. a ``-1`` denominator, and the renderer flips y (``HEIGHT-1-y``,
  world.rs:299) — the flip lives in the integrator's raygen call, not here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import struct

from ..utils import vec


@struct.dataclass
class Camera:
    origin: jnp.ndarray            # (3,)
    lower_left_corner: jnp.ndarray  # (3,)
    horizontal: jnp.ndarray        # (3,)
    vertical: jnp.ndarray          # (3,)
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @classmethod
    def perspective(
        cls,
        origin,
        width: int,
        height: int,
        screen_distance: float = 1.0,
        fov_degrees: float = 35.0,
        dtype=jnp.float32,
    ) -> "Camera":
        """Axis-aligned camera looking down -Z (camera.rs:50-82)."""
        fov = math.radians(fov_degrees)
        aspect = width / height
        viewport_height = 2.0 * math.tan(fov / 2.0) * screen_distance
        viewport_width = viewport_height * aspect

        origin = jnp.asarray(origin, dtype=dtype)
        horizontal = jnp.asarray([viewport_width, 0.0, 0.0], dtype=dtype)
        vertical = jnp.asarray([0.0, viewport_height, 0.0], dtype=dtype)
        llc = (
            origin
            - horizontal / 2.0
            - vertical / 2.0
            - jnp.asarray([0.0, 0.0, screen_distance], dtype=dtype)
        )
        return cls(origin, llc, horizontal, vertical, width, height)

    @classmethod
    def look_at(
        cls,
        origin,
        target,
        up,
        width: int,
        height: int,
        fov_degrees: float = 35.0,
        dtype=jnp.float32,
    ) -> "Camera":
        """Free-look constructor (camera.rs:94-130; dead code upstream, live here)."""
        fov = math.radians(fov_degrees)
        aspect = width / height
        origin = jnp.asarray(origin, dtype=dtype)
        target = jnp.asarray(target, dtype=dtype)
        up = jnp.asarray(up, dtype=dtype)

        w = vec.normalize(origin - target)
        u = vec.normalize(vec.cross(up, w))
        v = vec.cross(w, u)

        screen_distance = 1.0
        viewport_height = 2.0 * math.tan(fov / 2.0) * screen_distance
        viewport_width = viewport_height * aspect

        horizontal = u * viewport_width
        vertical = v * viewport_height
        llc = origin - horizontal / 2.0 - vertical / 2.0 - w * screen_distance
        return cls(origin, llc, horizontal, vertical, width, height)

    def generate_rays(self, px: jnp.ndarray, py: jnp.ndarray, jitter: jnp.ndarray,
                      transposed: bool = False):
        """Primary rays for pixel coords ``px, py`` (already y-flipped by the
        caller) with sub-pixel ``jitter`` of shape ``(N, 2)`` in [0,1).

        Returns ``(origins, directions)`` with unit directions (Ray::new
        normalizes, camera.rs:13) — shape ``(N, 3)``, or ``(3, N)`` kernel
        layout when ``transposed`` (identical per-component arithmetic, so
        the ray values match the untransposed call bit-for-bit).
        """
        dtype = self.origin.dtype
        u = (px.astype(dtype) + jitter[:, 0]) / (self.width - 1)
        v = (py.astype(dtype) + jitter[:, 1]) / (self.height - 1)
        if transposed:
            comps = [
                self.lower_left_corner[c]
                + self.horizontal[c] * u
                + self.vertical[c] * v
                - self.origin[c]
                for c in range(3)
            ]
            direction = jnp.stack(comps, axis=0)          # (3, N)
            ln = jnp.sqrt(sum(c * c for c in comps))
            safe = jnp.where(ln > 0.0, ln, 1.0)
            direction = jnp.where(ln[None, :] > 0.0, direction / safe[None, :],
                                  direction)
            origins = jnp.broadcast_to(self.origin[:, None], direction.shape)
            return origins, direction
        direction = (
            self.lower_left_corner
            + self.horizontal * u[:, None]
            + self.vertical * v[:, None]
            - self.origin
        )
        origins = jnp.broadcast_to(self.origin, direction.shape)
        return origins, vec.normalize(direction)
