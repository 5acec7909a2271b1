"""Deterministic sample-replay debugging.

The reference's entire debugging methodology is re-running a single pixel's
fixed-seed sample stream and printing the high-luminance outliers
(world.rs:372-678: ``test_pixel_79_176``, ``test_pixel_10_158_mis``,
``test_trace_sample_2369``). Counter-based RNG makes that a first-class,
scheduler-independent API here: any ``(pixel, sample)`` coordinate reproduces
its path bit-exactly no matter how the original frame was batched or sharded.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .integrators import trace_wave
from .models.camera import Camera
from .models.scene import Scene
from .utils import rng as rng_ops
from .utils import vec


def render_pixel_samples(
    scene: Scene,
    camera: Camera,
    x: int,
    y: int,
    *,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    max_bounces: int = 64,
    seed: int = 0,
) -> np.ndarray:
    """Radiance of every sample of one pixel: ``(spp, 3)``.

    Bit-identical to the corresponding samples of a full-frame render with
    the same seed (the replacement for the reference's per-pixel StdRng
    replay, world.rs:384-401).
    """
    pixel_id = jnp.full((spp,), y * width + x, jnp.int32)
    sample_idx = jnp.arange(spp, dtype=jnp.int32)
    key = rng_ops.base_key(seed)
    keys = rng_ops.pixel_sample_keys(key, pixel_id, sample_idx)
    jitter = rng_ops.primary_jitter(keys)
    o, d = camera.generate_rays(pixel_id % width, height - 1 - pixel_id // width, jitter)
    radiance = trace_wave(scene, o, d, keys, integrator=integrator, max_bounces=max_bounces)
    return np.asarray(radiance)


def replay_pixel(
    scene: Scene,
    camera: Camera,
    x: int,
    y: int,
    *,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    max_bounces: int = 64,
    seed: int = 0,
    luminance_threshold: float = 10.0,
) -> dict:
    """Firefly investigation report for one pixel — the reference's
    ``test_pixel_*`` workflow (world.rs:377-478) as structured data."""
    samples = render_pixel_samples(
        scene, camera, x, y, width=width, height=height, spp=spp,
        integrator=integrator, max_bounces=max_bounces, seed=seed,
    )
    lum = np.asarray(vec.luminance(jnp.asarray(samples)))
    mean = samples.mean(axis=0)
    hot = np.nonzero(lum > luminance_threshold)[0]
    top = int(np.argmax(lum))
    return {
        "pixel": [x, y],
        "spp": spp,
        "integrator": integrator,
        "mean_rgb_pre_gamma": [float(v) for v in mean],
        "mean_luminance": float(lum.mean()),
        "max_sample_index": top,
        "max_sample_luminance": float(lum[top]),
        "max_sample_rgb": [float(v) for v in samples[top]],
        "high_luminance_count": int(hot.size),
        "high_luminance_samples": [
            {
                "sample": int(i),
                "luminance": float(lum[i]),
                "rgb": [float(v) for v in samples[i]],
            }
            for i in hot[:20]
        ],
    }
