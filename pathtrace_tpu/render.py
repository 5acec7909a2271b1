"""Render orchestration: pixel grids, sample batching, accumulation, tonemap.

Replaces the reference driver (main.rs:39-68 rayon fan-out + world.rs:293-333
``render_pixel``): instead of one thread per pixel running 3000 sequential
samples, the whole frame is a wave of rays per sample batch, accumulated into a
device-resident ``(H, W, 3)`` float32 framebuffer. The accumulation state
(``image_sum``, ``num_samples``) doubles as the progressive-rendering
checkpoint (BASELINE config 4) — dump/restore it as NPY and resume exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .integrators import trace_wave
from .models.camera import Camera
from .models.scene import Scene
from .utils import rng as rng_ops
from .utils import vec


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 400            # world.rs:16
    height: int = 400           # world.rs:17
    spp: int = 3000             # world.rs:18
    integrator: str = "mis"     # runtime selection replacing cargo features (Cargo.toml:6-10)
    max_bounces: int = 64       # hard cap; RR decay from 50 makes deeper negligible (rendering.rs:7)
    seed: int = 0
    samples_per_batch: int = 1  # samples traced per device dispatch
    # NEE light samples per vertex (reference NUM_LIGHT_SAMPLES,
    # rendering.rs:10; constant 1 upstream). Wave engine only.
    num_light_samples: int = 1
    pixel_chunk: Optional[int] = None  # split the pixel wave to bound memory
    # Compute dtype for the whole estimator (None = keep the scene/camera
    # dtypes, i.e. float32). jnp.float64 reproduces the reference's native
    # precision (math.rs:4-8 computes in f64 throughout); it requires the
    # process-global jax_enable_x64 switch, checked loudly in cast_floats.
    dtype: Optional[object] = None


def cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree (Scene / Camera / state)
    to ``dtype``, leaving integer leaves (material ids, counts) alone.

    Raises if a 64-bit dtype is requested without ``jax_enable_x64`` — JAX
    would otherwise silently truncate the astype back to 32-bit.
    """
    dtype = jnp.dtype(dtype)
    if dtype.itemsize == 8 and not jax.config.jax_enable_x64:
        raise ValueError(
            "dtype=float64 requires the process-global x64 switch: set "
            "JAX_ENABLE_X64=1 or jax.config.update('jax_enable_x64', True) "
            "before creating arrays (the CLI's --dtype f64 does this)."
        )
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else a,
        tree,
    )


@dataclasses.dataclass
class RenderState:
    """Progressive accumulation state — the framework's checkpoint format."""

    image_sum: jnp.ndarray  # (H, W, 3) pre-gamma radiance sum
    num_samples: int

    @property
    def image(self) -> jnp.ndarray:
        """Mean pre-gamma radiance (the luminance-parity artifact,
        world.rs:317-319)."""
        return self.image_sum / max(self.num_samples, 1)

    def save(self, path: str) -> None:
        np.savez(
            path,
            image_sum=np.asarray(self.image_sum),
            num_samples=self.num_samples,
        )

    @classmethod
    def load(cls, path: str) -> "RenderState":
        z = np.load(path)
        return cls(jnp.asarray(z["image_sum"]), int(z["num_samples"]))


def pixel_grid(width: int, height: int):
    """Flat pixel ids in the reference's framebuffer layout ``y*W + x``
    (world.rs:318)."""
    return jnp.arange(width * height, dtype=jnp.int32)


@partial(
    jax.jit,
    static_argnames=("width", "height", "integrator", "max_bounces",
                     "samples_per_batch", "num_light_samples"),
)
def render_batch(
    scene: Scene,
    camera: Camera,
    pixel_ids: jnp.ndarray,
    sample_start,
    key: jax.Array,
    *,
    width: int,
    height: int,
    integrator: str,
    max_bounces: int,
    samples_per_batch: int,
    num_light_samples: int = 1,
) -> jnp.ndarray:
    """Radiance **sum** over ``samples_per_batch`` samples for each pixel id.

    Pure and jitted: the unit the parallel layer shards across chips.
    """
    px = pixel_ids % width
    py = pixel_ids // width

    def one_sample(s, acc):
        keys = rng_ops.pixel_sample_keys(key, pixel_ids, sample_start + s)
        # Jitter in the camera dtype: an f64 render drawing f32 jitter here
        # would trace a different sample set than the pool (which keys its
        # draws off the camera dtype), breaking sample-for-sample identity.
        jitter = rng_ops.primary_jitter(keys, dtype=camera.origin.dtype)
        # y-flip at raygen (world.rs:299).
        o, d = camera.generate_rays(px, height - 1 - py, jitter)
        radiance = trace_wave(
            scene, o, d, keys, integrator=integrator, max_bounces=max_bounces,
            num_light_samples=num_light_samples,
        )
        return acc + radiance

    # Derive the accumulator from pixel_ids so its varying-axes match the loop
    # body under shard_map (a plain zeros() would be device-invariant).
    zero = (pixel_ids * 0).astype(camera.origin.dtype)[:, None]
    acc0 = jnp.zeros((pixel_ids.shape[0], 3), dtype=camera.origin.dtype) + zero
    return jax.lax.fori_loop(0, samples_per_batch, one_sample, acc0)


def render(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    state: Optional[RenderState] = None,
    progress_callback=None,
) -> RenderState:
    """Full render (or continuation of ``state``) on the local device."""
    w, h = config.width, config.height
    assert camera.width == w and camera.height == h, "camera/config size mismatch"
    if config.dtype is not None:
        scene = cast_floats(scene, config.dtype)
        camera = cast_floats(camera, config.dtype)
        if state is not None:
            state = RenderState(
                state.image_sum.astype(config.dtype), state.num_samples
            )
    key = rng_ops.base_key(config.seed)
    ids = pixel_grid(w, h)

    if state is None:
        state = RenderState(jnp.zeros((h, w, 3), dtype=camera.origin.dtype), 0)

    image_sum = state.image_sum.reshape(-1, 3)
    done = state.num_samples
    chunks = (
        [ids]
        if config.pixel_chunk is None
        else [
            ids[i : i + config.pixel_chunk]
            for i in range(0, ids.shape[0], config.pixel_chunk)
        ]
    )

    while done < config.spp:
        nbatch = min(config.samples_per_batch, config.spp - done)
        for chunk in chunks:
            part = render_batch(
                scene,
                camera,
                chunk,
                done,
                key,
                width=w,
                height=h,
                integrator=config.integrator,
                max_bounces=config.max_bounces,
                samples_per_batch=nbatch,
                num_light_samples=config.num_light_samples,
            )
            image_sum = image_sum.at[chunk].add(part)
        done += nbatch
        if progress_callback is not None:
            progress_callback(done)

    return RenderState(image_sum.reshape(h, w, 3), done)


def to_srgb_u8(image: jnp.ndarray) -> np.ndarray:
    """Gamma-2.0 (sqrt) + clamp to u8, the reference's display transform
    (world.rs:321-331)."""
    g = jnp.sqrt(jnp.maximum(image, 0.0))
    return np.asarray(jnp.clip(g, 0.0, 1.0) * 255.0).astype(np.uint8)


def luminance_image(image: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance of the pre-gamma image (world.rs:359)."""
    return vec.luminance(image)
