"""Pool renderer must reproduce the plain wavefront renderer sample-for-sample:
same counter-based RNG coordinates → same paths, only accumulation order
differs (float tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.pool import ray_count, render_pool
from pathtrace_tpu.render import RenderConfig, render

W = H = 16
SPP = 4


@pytest.mark.parametrize("integrator", ["mis", "nee", "brdf_only"])
def test_pool_matches_wavefront(integrator):
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(W, H)
    ref = render(
        sc, cam,
        RenderConfig(width=W, height=H, spp=SPP, integrator=integrator,
                     max_bounces=8, seed=3, samples_per_batch=SPP),
    )
    img, rays, iters = render_pool(
        sc, cam, width=W, height=H, spp=SPP, integrator=integrator,
        max_bounces=8, num_slots=300, seed=3,
    )
    np.testing.assert_allclose(
        np.asarray(img).reshape(H, W, 3),
        np.asarray(ref.image_sum),
        rtol=2e-3, atol=2e-2,
    )
    assert ray_count(rays) > W * H * SPP  # at least the primaries, plus bounces
    assert int(iters) > 0


def test_pool_slot_count_invariance():
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(W, H)
    a, _, _ = render_pool(sc, cam, width=W, height=H, spp=2, integrator="mis",
                          max_bounces=6, num_slots=64, seed=1)
    b, _, _ = render_pool(sc, cam, width=W, height=H, spp=2, integrator="mis",
                          max_bounces=6, num_slots=512, seed=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-2)


def test_pool_glass_scene_finite():
    sc = scenes.many_spheres(n_per_side=3)
    cam = scenes.many_spheres_camera(W, H)
    img, rays, iters = render_pool(sc, cam, width=W, height=H, spp=2,
                                   integrator="mis", max_bounces=8,
                                   num_slots=128, seed=0)
    assert np.isfinite(np.asarray(img)).all()
