"""PBRMaterial lane (material.rs:298-389).

Upstream the material is dead code (private fields, no constructor, and its
specular sample delegates to the Mirror::sample_direction stub that returns
the normal — mirror.rs:307-315), so there is no reference image to match.
These tests pin the lane's internal consistency instead: the metallic=1 limit
must coincide with the Mirror reflection lane (both reduce to the same GGX
BRDF and VNDF-free pdf), the furnace response must stay bounded (kd energy
conservation, material.rs:332-341), and rendering with the lane must be
finite and deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.camera import Camera
from pathtrace_tpu.models.materials import Emissive, Mirror, PBRMaterial
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.ops import bsdf as bsdf_ops


def _dirs(n, key, up=True):
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    if up:
        d = d.at[:, 2].set(jnp.abs(d[:, 2]) + 1e-3)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return d


def _scene_with(m):
    return (
        SceneBuilder()
        .add_sphere((0, 0, 0), 1.0, m)
        .add_sphere((0, 50, 0), 1.0, Emissive((1, 1, 1)))
        .build()
    )


def test_metallic_limit_matches_mirror_reflection():
    """metallic=1 kills the diffuse term and collapses the pdf blend to the
    specular pdf, so the lane must equal the Mirror lane's reflection-side
    eval exactly (same D, G2, F, same D|n.h|/4|i.h| pdf)."""
    pbr = _scene_with(PBRMaterial((0.9, 0.7, 0.4), roughness=0.4, metallic=1.0))
    mir = _scene_with(Mirror(roughness=0.4, color=(0.9, 0.7, 0.4), metallic=1.0))

    n = 256
    key = jax.random.PRNGKey(0)
    i = _dirs(n, key)
    o = _dirs(n, jax.random.fold_in(key, 1))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    eta = jnp.ones((n,))
    mid = jnp.zeros((n,), jnp.int32)

    b_pbr, p_pbr = bsdf_ops.eval_bsdf(pbr, mid, i, eta, o, normal)
    b_mir, p_mir = bsdf_ops.eval_bsdf(mir, mid, i, eta, o, normal)
    np.testing.assert_allclose(np.asarray(b_pbr), np.asarray(b_mir), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pbr), np.asarray(p_mir), rtol=2e-5, atol=1e-6)


def test_pbr_furnace_bounded():
    """White-albedo PBR sphere in a uniform furnace: the kd factor
    (1-F)(1-metallic) keeps specular+diffuse from over-unity, so the mean
    response must stay at or below the furnace emission (up to MC noise and
    the reference's own technique-weight approximation) and well above zero."""
    from pathtrace_tpu.debug import render_pixel_samples

    E = 2.0
    sc = (
        SceneBuilder()
        .add_sphere((0, 0, 0), 50.0, Emissive((E, E, E)))
        .add_sphere((0, 0, -3), 1.0, PBRMaterial((1.0, 1.0, 1.0), roughness=0.6))
        .build()
    )
    cam = Camera.perspective((0, 0, 0), 32, 32, 1.0, 20.0)
    samples = render_pixel_samples(
        sc, cam, 16, 16, width=32, height=32, spp=1024,
        integrator="brdf_only", max_bounces=8, seed=0,
    )
    mean = np.asarray(samples).mean(axis=0)
    assert np.all(np.isfinite(mean))
    assert np.all(mean <= E * 1.08), mean
    assert np.all(mean >= E * 0.5), mean


def test_pbr_render_finite_and_deterministic():
    from pathtrace_tpu.render import RenderConfig, render

    b = SceneBuilder()
    b.add_quad((-2, -1, -6), (2, -1, -6), (2, -1, -2), (-2, -1, -2),
               PBRMaterial((0.7, 0.5, 0.3), roughness=0.3, metallic=0.5))
    b.add_sphere((0, 0, -4), 1.0, PBRMaterial((0.9, 0.9, 0.9), roughness=0.2))
    b.add_triangle((-1, 3, -5), (1, 3, -5), (0, 3, -3), Emissive((8, 8, 8)))
    sc = b.build()
    cam = Camera.perspective((0, 0.5, 1.0), 24, 24, 1.0, 40.0)
    cfg = RenderConfig(width=24, height=24, spp=8, max_bounces=6, seed=3)
    img1 = np.asarray(render(sc, cam, cfg).image)
    img2 = np.asarray(render(sc, cam, cfg).image)
    assert np.all(np.isfinite(img1))
    assert img1.max() > 0.0
    np.testing.assert_array_equal(img1, img2)
