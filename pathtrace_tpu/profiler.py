"""Render observability: structured per-render statistics.

The reference's only instrumentation is ``println!`` phase messages and the
live window (SURVEY §5). Here every render can return a structured stats
record — traced rays, pool iterations, wall time, throughput — suitable for
logging, regression tracking, and the driver benchmark.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import jax

from .models.camera import Camera
from .models.scene import Scene
from .pool import ray_count, render_pool
from .render import RenderState


@dataclasses.dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    integrator: str
    traced_rays: int
    pool_iterations: int
    wall_s: float
    mrays_per_s: float
    spp_per_s: float
    platform: str

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def profiled_render(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    max_bounces: int = 64,
    num_slots: int = 32768,
    seed: int = 0,
    sample_offset: int = 0,
    state: Optional[RenderState] = None,
):
    """Pool render returning ``(RenderState, RenderStats)``.

    Timing includes compilation on first call for a given shape; call twice
    (or pre-warm) for steady-state numbers.
    """
    t0 = time.perf_counter()
    image_sum, rays, iters = render_pool(
        scene,
        camera,
        width=width,
        height=height,
        spp=spp,
        integrator=integrator,
        max_bounces=max_bounces,
        num_slots=num_slots,
        seed=seed,
        sample_offset=sample_offset,
    )
    image_sum = image_sum.block_until_ready()
    wall = time.perf_counter() - t0

    image = image_sum.reshape(height, width, 3)
    if state is not None:
        image = state.image_sum + image
        spp_total = state.num_samples + spp
    else:
        spp_total = spp

    stats = RenderStats(
        width=width,
        height=height,
        spp=spp,
        integrator=integrator,
        traced_rays=ray_count(rays),
        pool_iterations=int(iters),
        wall_s=round(wall, 4),
        mrays_per_s=round(ray_count(rays) / wall / 1e6, 3),
        spp_per_s=round(spp / wall, 4),
        platform=jax.devices()[0].platform,
    )
    return RenderState(image, spp_total), stats
