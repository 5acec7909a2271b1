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
sharded render traces exactly the same sample set as the single-device render
for any mesh shape; the images agree up to float accumulation order (the psum
reassociates the per-sample-group partial sums), which tests bound at
rtol 1e-3 (tests/test_sharding.py). Determinism of the sample set is the
distributed correctness check (SURVEY §5 race detection).
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
from ..pool import _pool_loop
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


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "integrator", "max_bounces",
        "num_slots", "seed", "sample_offset", "method",
    ),
)
def render_pool_sharded(
    scene: Scene,
    camera: Camera,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    max_bounces: int = 64,
    num_slots: int = 32768,
    seed: int = 0,
    sample_offset: int = 0,
    method: str | None = None,
):
    """Multi-chip render on the *production* persistent-pool path.

    Each device runs its own saturated path pool (:func:`_pool_loop`) over a
    private window of the work: the flat pixel array splits into contiguous
    windows over ``dp``, and the sample range ``[sample_offset,
    sample_offset+spp)`` splits over ``sp``; per-pixel radiance sums merge
    with a psum over the ``sp`` axis (ICI). Because the RNG keys off global
    ``(pixel, sample)`` coordinates, every mesh shape traces the identical
    sample set as the single-device :func:`pathtrace_tpu.pool.render_pool`;
    images agree up to float accumulation order (tests/test_sharding.py).

    Each device's pool drains independently — there is no cross-device
    synchronization until the final psum, so load imbalance costs only the
    tail, not lockstep stalls.

    Returns ``(image_sum (H*W, 3), counters (dp, sp, 4) uint32
    (rays_hi, rays_lo, busy_hi, busy_lo), iters (dp, sp))``;
    decode/aggregate with :func:`pathtrace_tpu.pool.ray_count` /
    :func:`pathtrace_tpu.pool.busy_count`.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    if spp % sp:
        raise ValueError(f"spp={spp} must divide by sample-axis size {sp}")
    num_pixels = width * height
    local_n = -(-num_pixels // dp)  # per-shard pixel window (last may overhang)
    pixel_lo = jnp.arange(dp, dtype=jnp.int32) * local_n
    sample_lo = jnp.arange(sp, dtype=jnp.int32) * (spp // sp) + sample_offset

    scene_spec = jax.tree.map(lambda _: P(), scene)
    camera_spec = jax.tree.map(lambda _: P(), camera)

    def local(scene, camera, plo, slo):
        img, rays, iters = _pool_loop(
            scene,
            camera,
            plo[0],
            slo[0],
            width=width,
            height=height,
            total_pixels=num_pixels,
            local_pixels=local_n,
            spp=spp // sp,
            integrator=integrator,
            max_bounces=max_bounces,
            num_slots=num_slots,
            seed=seed,
            method=method,
        )
        # Merge sample-parallel partial sums over ICI; ray/iter counters are
        # returned per-device (exact 64-bit aggregation happens on host).
        img = jax.lax.psum(img, "sp")
        return img, rays[None, None, :], iters[None, None]

    img, rays, iters = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, camera_spec, P("dp"), P("sp")),
        out_specs=(P("dp"), P("dp", "sp"), P("dp", "sp")),
    )(scene, camera, pixel_lo, sample_lo)
    return img[:num_pixels], rays, iters


def stack_cameras(cameras) -> Camera:
    """Stack same-resolution cameras into one pytree with a leading frame
    axis (the unit :func:`frames_sharded` shards over ``dp``)."""
    w, h = cameras[0].width, cameras[0].height
    if any(c.width != w or c.height != h for c in cameras):
        raise ValueError("all cameras in a frame batch must share a resolution")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "integrator", "max_bounces", "seed",
    ),
)
def _frames_sharded_sum(
    scene: Scene,
    cams: Camera,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    integrator: str,
    max_bounces: int,
    seed: int,
):
    """Radiance sums for a stacked camera batch: frames shard over ``dp``
    (each device scans its local frames, one full pixel wave per step, in a
    single dispatch), sample groups shard over ``sp`` and merge with psum."""
    sp = mesh.shape["sp"]
    if spp % sp:
        raise ValueError(f"spp={spp} must divide by sample-axis size {sp}")
    key = jax.random.key(seed)
    ids = pixel_grid(width, height)
    sample_starts = jnp.arange(sp, dtype=jnp.int32) * (spp // sp)

    scene_spec = jax.tree.map(lambda _: P(), scene)
    cam_spec = jax.tree.map(lambda _: P("dp"), cams)

    def local(scene, cams_local, ids_local, start_local):
        # Pixel ids are replicated (frames, not pixels, are the dp axis here);
        # mark them varying over both axes so render_batch's loop carry —
        # derived from them — matches its body's varying type (which picks up
        # dp from the camera and sp from the sample start).
        ids_local = jax.lax.pcast(ids_local, ("dp", "sp"), to="varying")
        start_local = jax.lax.pcast(start_local, ("dp",), to="varying")

        def one_frame(carry, cam):
            acc = render_batch(
                scene,
                cam,
                ids_local,
                start_local[0],
                key,
                width=width,
                height=height,
                integrator=integrator,
                max_bounces=max_bounces,
                samples_per_batch=spp // sp,
            )
            return carry, jax.lax.psum(acc, "sp")

        _, accs = jax.lax.scan(one_frame, 0, cams_local)
        return accs  # (F_local, H*W, 3)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, cam_spec, P(), P("sp")),
        out_specs=P("dp"),
    )(scene, cams, ids, sample_starts)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "integrator", "max_bounces",
        "num_slots", "seed", "method",
    ),
)
def _frames_pool_sum(
    scene: Scene,
    cams: Camera,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    integrator: str,
    max_bounces: int,
    num_slots: int,
    seed: int,
    method: str | None = None,
):
    """Radiance sums for a stacked camera batch on the *production pool*
    engine: frames shard over ``dp`` (each device scans its local frames,
    running a full persistent-pool render per frame, all in ONE dispatch) and
    sample groups shard over ``sp`` with a psum merge. Returns
    ``(accs (F, H*W, 3), counters (F, sp, 4), iters (F, sp))``."""
    sp = mesh.shape["sp"]
    if spp % sp:
        raise ValueError(f"spp={spp} must divide by sample-axis size {sp}")
    dp = mesh.shape["dp"]
    num_pixels = width * height
    # Zero pixel offsets carried as a dp-sharded vector purely so each
    # device's _pool_loop carries pick up the dp varying axis (the loop
    # derives every carry from its traced offsets — pool.py).
    pixel_lo = jnp.zeros((dp,), jnp.int32)
    sample_lo = jnp.arange(sp, dtype=jnp.int32) * (spp // sp)

    scene_spec = jax.tree.map(lambda _: P(), scene)
    cam_spec = jax.tree.map(lambda _: P("dp"), cams)

    def local(scene, cams_local, plo, slo):
        def one_frame(carry, cam):
            img, rays, iters = _pool_loop(
                scene,
                cam,
                plo[0],
                slo[0],
                width=width,
                height=height,
                total_pixels=num_pixels,
                local_pixels=num_pixels,
                spp=spp // sp,
                integrator=integrator,
                max_bounces=max_bounces,
                num_slots=num_slots,
                seed=seed,
                method=method,
            )
            return carry, (jax.lax.psum(img, "sp"), rays[None, :], iters[None])

        _, (accs, rays, iters) = jax.lax.scan(one_frame, 0, cams_local)
        return accs, rays, iters

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, cam_spec, P("dp"), P("sp")),
        out_specs=(P("dp"), P("dp", "sp"), P("dp", "sp")),
    )(scene, cams, pixel_lo, sample_lo)


def frames_pool_sharded(
    scene: Scene,
    cameras,
    config,
    mesh: Optional[Mesh] = None,
    num_slots: int = 32768,
    method: str | None = None,
    chunk_frames: int | None = 8,
):
    """Batched animation on the production pool engine (BASELINE config 5).

    Replaces the wave-integrator ``frames_sharded`` for throughput work: the
    pool renderer is several times faster at production sizes (its occupancy
    does not collapse with the wave tail). Frames shard over ``dp``, sample
    windows over ``sp``.

    ``chunk_frames`` bounds how many frames *per device* ride in one
    dispatch: the sweep runs as ceil(F / (dp*chunk)) identical dispatches of
    one compiled executable. Frames are mutually independent (counter RNG on
    global (pixel, sample); per-frame cameras), so chunking is sample-exact.
    Bounded dispatches keep device runs interruptible and sidestep the
    multi-minute single-dispatch executions that the remote runtime's
    watchdog kills (observed: a 120-frame one-dispatch mesh sweep crashes the
    TPU worker; 16 frames are fine — docs/PERFORMANCE.md round 4). Pass
    ``None`` for the old single-dispatch form.

    Returns ``(frames (F, H, W, 3) mean radiance, counters, iters)``;
    aggregate counters with :func:`pathtrace_tpu.pool.ray_count`.
    """
    mesh = mesh or make_mesh()
    dp = mesh.shape["dp"]
    cameras = list(cameras)
    n_frames = len(cameras)
    w, h = config.width, config.height
    slots = min(num_slots, w * h)
    step = dp * (chunk_frames or -(-n_frames // dp))
    pad = (-n_frames) % step
    cams_all = cameras + [cameras[-1]] * pad
    accs, rays_l, iters_l = [], [], []
    for s in range(0, len(cams_all), step):
        cams = stack_cameras(cams_all[s : s + step])
        acc, rays, iters = _frames_pool_sum(
            scene,
            cams,
            mesh=mesh,
            width=w,
            height=h,
            spp=config.spp,
            integrator=config.integrator,
            max_bounces=config.max_bounces,
            num_slots=slots,
            seed=config.seed,
            method=method,
        )
        accs.append(acc)
        rays_l.append(rays)
        iters_l.append(iters)
    acc = jnp.concatenate(accs) if len(accs) > 1 else accs[0]
    rays = jnp.concatenate(rays_l) if len(rays_l) > 1 else rays_l[0]
    iters = jnp.concatenate(iters_l) if len(iters_l) > 1 else iters_l[0]
    frames = acc[:n_frames].reshape(n_frames, h, w, 3) / config.spp
    return frames, rays[:n_frames], iters[:n_frames]


def frames_sharded(
    scene: Scene,
    cameras,
    config,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Batched-animation data parallelism (BASELINE config 5): the frame axis
    shards over ``dp`` — one shard_map dispatch renders every frame, each
    device scanning its own frames with per-frame cameras — while ``sp``
    groups split the sample range and psum. Returns ``(F, H, W, 3)`` mean
    radiance in input frame order."""
    mesh = mesh or make_mesh()
    dp = mesh.shape["dp"]
    cameras = list(cameras)
    n_frames = len(cameras)
    pad = (-n_frames) % dp
    cams = stack_cameras(cameras + [cameras[-1]] * pad)
    w, h = config.width, config.height
    acc = _frames_sharded_sum(
        scene,
        cams,
        mesh=mesh,
        width=w,
        height=h,
        spp=config.spp,
        integrator=config.integrator,
        max_bounces=config.max_bounces,
        seed=config.seed,
    )
    return acc[:n_frames].reshape(n_frames, h, w, 3) / config.spp
