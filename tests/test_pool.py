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


def test_pool_matches_wavefront_f64():
    """The sample-for-sample identity claim (pool.py docstring) at a tolerance
    that would catch an estimator divergence: in f64 the only pool-vs-wave
    difference left is the trace-at-top MIS algebra's rounding, orders below
    any real estimator bug. The f32 tests above only bound accumulation-order
    noise. Runs in a subprocess because x64 is a process-global switch."""
    import json
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import jax.numpy as jnp
import numpy as np
from pathtrace_tpu.models import scenes
from pathtrace_tpu.pool import render_pool
from pathtrace_tpu.render import RenderConfig, render

W = H = 12
SPP = 2
sc = scenes.cornell_box()
cam = scenes.cornell_camera(W, H)
ref = render(sc, cam, RenderConfig(width=W, height=H, spp=SPP, integrator="mis",
                                   max_bounces=8, seed=3, samples_per_batch=SPP,
                                   dtype=jnp.float64))
img, rays, iters = render_pool(sc, cam, width=W, height=H, spp=SPP,
                               integrator="mis", max_bounces=8, num_slots=37, seed=3,
                               dtype=jnp.float64)
assert img.dtype == jnp.float64 and ref.image_sum.dtype == jnp.float64
a = np.asarray(img).reshape(H, W, 3)
b = np.asarray(ref.image_sum)
denom = np.maximum(np.abs(b), 1.0)
print(json.dumps({"max_rel": float(np.max(np.abs(a - b) / denom))}))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    max_rel = json.loads(out.stdout.strip().splitlines()[-1])["max_rel"]
    assert max_rel <= 1e-6, f"pool vs wave diverged in f64: max_rel={max_rel}"


def test_pool_glass_scene_finite():
    sc = scenes.many_spheres(n_per_side=3)
    cam = scenes.many_spheres_camera(W, H)
    img, rays, iters = render_pool(sc, cam, width=W, height=H, spp=2,
                                   integrator="mis", max_bounces=8,
                                   num_slots=128, seed=0)
    assert np.isfinite(np.asarray(img)).all()


def test_pool_pair_stealing_equivalence():
    """Pair work-stealing (drain-tail harvest) must execute EXACTLY the same
    path set — same traced-ray count, same per-pixel sample values (image
    equal up to addition order) — in no more iterations than the plain
    per-slot streams."""
    import os

    import jax

    from pathtrace_tpu.models import scenes

    sc = scenes.many_spheres(n_per_side=3)
    cam = scenes.many_spheres_camera(24, 24)

    def run():
        img, rays, iters = render_pool(sc, cam, width=24, height=24, spp=4,
                                       integrator="mis", max_bounces=6,
                                       num_slots=64, seed=5)
        return np.asarray(img), ray_count(rays), int(iters)

    os.environ["PT_STEAL"] = "4"     # stealing is opt-in since round 4
    jax.clear_caches()   # the knob is read at trace time
    try:
        a, ra, ia = run()
    finally:
        del os.environ["PT_STEAL"]
        jax.clear_caches()
    b, rb, ib = run()
    assert ra == rb                      # identical work executed
    assert ia <= ib                      # stealing never adds iterations
    assert ib > ia                       # and actually harvests this tail
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pool_per_call_method_knob():
    """render_pool(method=...) must equal the global set_default_method
    route bitwise — same traced program, no global cache invalidation."""
    import numpy as np

    from pathtrace_tpu.ops.intersect import set_default_method

    sc = scenes.mesh_scene(n_tris=600)
    W = H = 8
    cam = scenes.mesh_scene_camera(W, H)
    kw = dict(width=W, height=H, spp=1, integrator="mis", max_bounces=2,
              num_slots=16, seed=2)
    a, ra, _ = render_pool(sc, cam, method="bvh_interpret", **kw)
    try:
        set_default_method("bvh_interpret")
        b, rb, _ = render_pool(sc, cam, **kw)
    finally:
        set_default_method(None)
    assert ray_count(ra) == ray_count(rb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
