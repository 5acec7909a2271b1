"""Multi-chip rendering: pixel-tile data parallelism × sample parallelism.

The reference's only parallelism is rayon threads over pixels with a mutex'd
framebuffer (main.rs:39-68). The TPU-native equivalent (SURVEY §2/§5) is a 2-D
device mesh:

* ``dp`` axis — pixel tiles. Pixels are embarrassingly parallel; each chip owns
  a contiguous shard of the flat pixel array. Zero communication until export.
* ``sp`` axis — sample replicas. Chips on the same pixel shard render disjoint
  sample-index ranges of the *same* pixels and ``psum`` their accumulators over
  ICI — the collective replacing the reference's mutex-guarded framebuffer
  merge.

Because the RNG is counter-based on global ``(pixel, sample)`` coordinates, the
sharded render is bit-identical to the single-device render for any mesh shape
— determinism is the distributed correctness check (SURVEY §5 race detection).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.camera import Camera
from ..models.scene import Scene
from ..render import RenderState, pixel_grid, render_batch


def make_mesh(devices=None, dp: Optional[int] = None, sp: Optional[int] = None) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the given (default: all) devices.

    Defaults put every device on the pixel axis; pass ``sp>1`` to replicate
    pixel shards across sample groups (useful when a frame has too few pixels
    to feed every chip).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"mesh {dp}x{sp} != {n} devices")
    import numpy as np

    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def _pad_to(ids: jnp.ndarray, multiple: int) -> jnp.ndarray:
    pad = (-ids.shape[0]) % multiple
    if pad:
        # Padding pixels re-render pixel 0; their results are dropped on unpad.
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    return ids


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "integrator", "max_bounces", "seed",
    ),
)
def _render_sharded_sum(
    scene: Scene,
    camera: Camera,
    ids: jnp.ndarray,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    integrator: str,
    max_bounces: int,
    seed: int,
):
    """Radiance sum over ``spp`` samples for (padded) pixel ids, computed on
    the mesh. Output is sharded over ``dp`` and replicated over ``sp``."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    if spp % sp:
        raise ValueError(f"spp={spp} must divide by sample-axis size {sp}")
    key = jax.random.key(seed)
    sample_starts = jnp.arange(sp, dtype=jnp.int32) * (spp // sp)

    scene_spec = jax.tree.map(lambda _: P(), scene)
    camera_spec = jax.tree.map(lambda _: P(), camera)

    def local(scene, camera, ids_local, start_local):
        # Mark both inputs varying over BOTH mesh axes up front so every
        # derived loop-carry inside render_batch has a consistent varying type
        # (ids vary only over dp, sample starts only over sp, by sharding).
        ids_local = jax.lax.pcast(ids_local, ("sp",), to="varying")
        start_local = jax.lax.pcast(start_local, ("dp",), to="varying")
        acc = render_batch(
            scene,
            camera,
            ids_local,
            start_local[0],
            key,
            width=width,
            height=height,
            integrator=integrator,
            max_bounces=max_bounces,
            samples_per_batch=spp // sp,
        )
        # Merge the sample-parallel partial sums over ICI.
        return jax.lax.psum(acc, "sp")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, camera_spec, P("dp"), P("sp")),
        out_specs=P("dp"),
    )(scene, camera, ids, sample_starts)


def render_sharded(
    scene: Scene,
    camera: Camera,
    config,
    mesh: Optional[Mesh] = None,
) -> RenderState:
    """Multi-chip render producing the same RenderState as :func:`render`."""
    mesh = mesh or make_mesh()
    w, h = config.width, config.height
    ids = pixel_grid(w, h)
    n = ids.shape[0]
    padded = _pad_to(ids, mesh.shape["dp"])
    acc = _render_sharded_sum(
        scene,
        camera,
        padded,
        mesh=mesh,
        width=w,
        height=h,
        spp=config.spp,
        integrator=config.integrator,
        max_bounces=config.max_bounces,
        seed=config.seed,
    )
    image_sum = acc[:n].reshape(h, w, 3)
    return RenderState(image_sum, config.spp)


def frames_sharded(
    scene: Scene,
    cameras,
    config,
    mesh: Optional[Mesh] = None,
):
    """Batched-animation data parallelism (BASELINE config 5): one frame's
    pixel wave per ``dp`` group, cameras differing per frame. Returns
    ``(F, H, W, 3)`` mean radiance."""
    mesh = mesh or make_mesh()
    images = []
    for cam in cameras:  # frames stream through the mesh; each is internally DP
        images.append(render_sharded(scene, cam, config, mesh).image)
    return jnp.stack(images)
