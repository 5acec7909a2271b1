"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.parallel.sharding import (
    frames_pool_sharded,
    frames_sharded,
    make_mesh,
    render_pool_sharded,
    render_sharded,
)
from pathtrace_tpu.pool import ray_count, render_pool
from pathtrace_tpu.render import RenderConfig, render
from .imgutil import assert_images_match

W = H = 32


@pytest.fixture(scope="module")
def scene():
    return scenes.cornell_box()


@pytest.fixture(scope="module")
def camera():
    return scenes.cornell_camera(W, H)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(scene, camera, dp, sp):
    """Any mesh shape must reproduce the single-device image — counter-based
    RNG makes distribution across chips invisible to the estimator. Tolerance
    covers float reassociation across different XLA fusion choices, plus a
    small outlier budget for knife-edge sample flips between the two
    compilations (see tests/imgutil.py)."""
    cfg = RenderConfig(width=W, height=H, spp=8, integrator="mis", seed=9,
                       samples_per_batch=8)
    ref = np.asarray(render(scene, camera, cfg).image_sum)
    mesh = make_mesh(dp=dp, sp=sp)
    out = np.asarray(render_sharded(scene, camera, cfg, mesh).image_sum)
    assert_images_match(out, ref, rtol=1e-3, atol=5e-3, max_outliers=3)


def test_sharded_nonuniform_pixel_count(scene, camera):
    # 32*32=1024 divides 8; use a 6-device mesh shape instead to force padding
    mesh = make_mesh(jax.devices()[:6], dp=6, sp=1)
    cfg = RenderConfig(width=W, height=H, spp=4, seed=2, samples_per_batch=4)
    ref = np.asarray(render(scene, camera, cfg).image_sum)
    out = np.asarray(render_sharded(scene, camera, cfg, mesh).image_sum)
    assert_images_match(out, ref, rtol=1e-5, atol=1e-4, max_outliers=2)


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_pool_sharded_matches_single_device(scene, camera, dp, sp):
    """The *production* pool renderer sharded over any dp×sp mesh must trace
    the identical sample set as the single-device pool: exact ray counts,
    images equal up to float accumulation order (each pixel's samples flush
    in a different interleaving per schedule)."""
    kw = dict(width=W, height=H, spp=8, integrator="mis", max_bounces=6,
              num_slots=64, seed=9)
    ref_img, ref_rays, _ = render_pool(scene, camera, **kw)
    ref = np.asarray(ref_img)
    mesh = make_mesh(dp=dp, sp=sp)
    img, rays, iters = render_pool_sharded(scene, camera, mesh=mesh, **kw)
    assert ray_count(rays) == ray_count(ref_rays)
    assert iters.shape == (dp, sp)
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-5, atol=1e-5)


def test_pool_sharded_nondividing_pixels(scene, camera):
    """Pixel count not divisible by dp (1024 pixels on 6 devices) pads the
    last window; padding work items must not corrupt the image."""
    mesh = make_mesh(jax.devices()[:6], dp=6, sp=1)
    kw = dict(width=W, height=H, spp=4, integrator="mis", max_bounces=6,
              num_slots=64, seed=2)
    ref_img, ref_rays, _ = render_pool(scene, camera, **kw)
    img, rays, _ = render_pool_sharded(scene, camera, mesh=mesh, **kw)
    assert ray_count(rays) == ray_count(ref_rays)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-5, atol=1e-5)


def test_pool_sharded_weak_scaling(scene, camera):
    """Weak-scaling evidence on the virtual mesh: with dp devices each owning
    1/dp of the pixels, per-device pool iteration counts must drop ~1/dp of
    the single-device count (each device's work queue is 1/dp as long; the
    tolerance covers per-window path-length variance and drain tails)."""
    kw = dict(width=W, height=H, spp=8, integrator="mis", max_bounces=6,
              num_slots=32, seed=4)
    _, _, ref_iters = render_pool(scene, camera, **kw)
    ref = int(ref_iters)
    for dp in (2, 4, 8):
        mesh = make_mesh(jax.devices()[:dp], dp=dp, sp=1)
        _, rays, iters = render_pool_sharded(scene, camera, mesh=mesh, **kw)
        per_dev = np.asarray(iters).reshape(-1)
        assert per_dev.shape == (dp,)
        # Each device's iterations ~ ref/dp; bound loosely but meaningfully.
        assert per_dev.max() <= 0.25 * ref + ref / dp * 1.6, (dp, ref, per_dev)
        assert per_dev.min() >= ref / dp * 0.4, (dp, ref, per_dev)


def test_pool_sharded_checkpoint_resume(scene, camera):
    """Sharded checkpoint/resume: two sharded passes over disjoint sample
    windows (the checkpoint boundary) must reproduce the one-pass sharded
    render — same traced sample set, exact ray-count additivity."""
    mesh = make_mesh(jax.devices()[:4], dp=2, sp=2)
    kw = dict(width=W, height=H, integrator="mis", max_bounces=6,
              num_slots=64, seed=11)
    full_img, full_rays, _ = render_pool_sharded(
        scene, camera, mesh=mesh, spp=8, **kw
    )
    a_img, a_rays, _ = render_pool_sharded(
        scene, camera, mesh=mesh, spp=4, sample_offset=0, **kw
    )
    b_img, b_rays, _ = render_pool_sharded(
        scene, camera, mesh=mesh, spp=4, sample_offset=4, **kw
    )
    assert ray_count(a_rays) + ray_count(b_rays) == ray_count(full_rays)
    np.testing.assert_allclose(
        np.asarray(a_img) + np.asarray(b_img), np.asarray(full_img),
        rtol=1e-5, atol=1e-5,
    )


def test_frames_pool_matches_per_frame_pool(scene):
    """Config-5 production path: the one-dispatch pool frame batch must trace
    the identical sample set as per-frame single-device pool renders — exact
    per-frame ray counts, images equal up to accumulation order."""
    import dataclasses

    from pathtrace_tpu.models import scenes as _scenes

    base = scenes.cornell_camera(W, H)
    cams = [
        dataclasses.replace(base, origin=base.origin + jnp.asarray([0.02 * i, 0.0, 0.0]))
        for i in range(3)
    ]
    cfg = RenderConfig(width=W, height=H, spp=4, integrator="mis",
                       max_bounces=5, seed=3)
    frames, rays, iters = frames_pool_sharded(
        scene, cams, cfg, make_mesh(dp=4, sp=2), num_slots=64
    )
    assert frames.shape == (3, H, W, 3)
    assert rays.shape[0] == 3 and iters.shape[0] == 3
    for i, cam in enumerate(cams):
        ref_img, ref_rays, _ = render_pool(
            scene, cam, width=W, height=H, spp=cfg.spp, integrator="mis",
            max_bounces=5, num_slots=64, seed=3,
        )
        assert ray_count(rays[i]) == ray_count(ref_rays)
        np.testing.assert_allclose(
            np.asarray(frames[i]).reshape(-1, 3),
            np.asarray(ref_img) / cfg.spp,
            rtol=1e-5, atol=1e-5,
        )
    assert np.abs(np.asarray(frames[0]) - np.asarray(frames[2])).max() > 1e-4


def test_frames_batched_matches_per_frame_render(scene):
    """One shard_map dispatch over the frame axis must reproduce each frame's
    single-device render, with per-frame cameras and a frame count that does
    not divide the dp axis (3 frames on dp=4 forces padding)."""
    import dataclasses

    base = scenes.cornell_camera(W, H)
    cams = [
        dataclasses.replace(base, origin=base.origin + jnp.asarray([0.02 * i, 0.0, 0.0]))
        for i in range(3)
    ]
    cfg = RenderConfig(width=W, height=H, spp=2, seed=0, samples_per_batch=2)
    imgs = frames_sharded(scene, cams, cfg, make_mesh(dp=4, sp=2))
    assert imgs.shape == (3, H, W, 3)
    for i, cam in enumerate(cams):
        ref = np.asarray(render(scene, cam, cfg).image)
        assert_images_match(imgs[i], ref, rtol=1e-3, atol=5e-3, max_outliers=2)
    # Distinct cameras must produce distinct frames.
    assert np.abs(np.asarray(imgs[0]) - np.asarray(imgs[2])).max() > 1e-4


def test_frames_pool_chunking_is_sample_exact(scene):
    """Chunked frame dispatches (bounded single-dispatch duration — the
    remote runtime kills multi-minute executions) must reproduce the
    one-dispatch sweep bitwise: frames are independent (counter RNG on
    global (pixel, sample)), so chunk boundaries cannot change samples."""
    import dataclasses

    base = scenes.cornell_camera(W, H)
    cams = [
        dataclasses.replace(base, origin=base.origin + jnp.asarray([0.02 * i, 0.0, 0.0]))
        for i in range(5)
    ]
    cfg = RenderConfig(width=W, height=H, spp=4, integrator="mis",
                       max_bounces=4, seed=3)
    mesh = make_mesh(dp=4, sp=2)
    one, r1, i1 = frames_pool_sharded(scene, cams, cfg, mesh, num_slots=64,
                                      chunk_frames=None)
    chk, r2, i2 = frames_pool_sharded(scene, cams, cfg, mesh, num_slots=64,
                                      chunk_frames=2)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(chk))
    assert ray_count(r1) == ray_count(r2)
