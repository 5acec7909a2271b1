"""Integrator-level energy conservation (white furnace).

A convex Lambertian sphere inside a uniform emissive enclosure sees the
emission E from every direction, so its outgoing radiance is exactly
albedo * E — every bounce after the first escapes to the enclosure (convexity)
and the BRDF-only estimator must average to rho*E with only MC noise.
This validates the full chain (raygen, intersection, BSDF sampling, RR
weighting) against a closed-form answer — a test class the reference lacks
(SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.debug import render_pixel_samples
from pathtrace_tpu.models.camera import Camera
from pathtrace_tpu.models.materials import Emissive, Lambertian
from pathtrace_tpu.models.scene import SceneBuilder


def test_lambert_furnace():
    rho = 0.6
    E = 2.0
    sc = (
        SceneBuilder()
        .add_sphere((0, 0, 0), 50.0, Emissive((E, E, E)))     # enclosure
        .add_sphere((0, 0, -3), 1.0, Lambertian((rho, rho, rho)))
        .build()
    )
    cam = Camera.perspective((0, 0, 0), 32, 32, 1.0, 20.0)
    # center pixels hit the diffuse sphere head-on
    samples = render_pixel_samples(
        sc, cam, 16, 16, width=32, height=32, spp=2048,
        integrator="brdf_only", max_bounces=8, seed=0,
    )
    mean = samples.mean(axis=0)
    # Analytic: rho * E = 1.2; MC sigma ~ rho*E/sqrt(2048) ~ 0.03
    np.testing.assert_allclose(mean, rho * E, rtol=0.05)


def test_cosine_sampler_chi_square():
    """Chi-square of the cosine-weighted sampler against its analytic CDF
    P(cos θ < c) = c² (material.rs:99-110)."""
    import jax

    from pathtrace_tpu.utils import vec

    n = 1 << 16
    u = jax.random.uniform(jax.random.key(0), (n, 2))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = vec.cosine_hemisphere_direction(normal, u[:, 0], u[:, 1])
    c = np.asarray(d[:, 2])

    bins = np.linspace(0, 1, 11)
    counts, _ = np.histogram(c, bins=bins)
    expected = (bins[1:] ** 2 - bins[:-1] ** 2) * n
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # 9 dof; P(chi2 > 27.9) ≈ 0.001
    assert chi2 < 27.9, (chi2, counts, expected)


def test_triangle_light_sampler_chi_square():
    """Area-uniform triangle sampling (shape.rs:210-219): barycentric u has
    density 2(1-u) under the sqrt warp."""
    import jax

    from pathtrace_tpu.models.materials import Emissive, Lambertian
    from pathtrace_tpu.ops import lights as light_ops

    b = SceneBuilder()
    b.add_triangle((0, 5, 0), (1, 5, 0), (0, 5, 1), Emissive((1, 1, 1)))
    b.add_sphere((0, -100, 0), 0.1, Lambertian((1, 1, 1)))
    sc = b.build()
    n = 1 << 15
    uu = jax.random.uniform(jax.random.key(1), (n, 3))
    ls = light_ops.sample_light_point(
        sc, jnp.zeros((n, 3)), uu[:, 0], uu[:, 1], uu[:, 2]
    )
    # recover barycentric u = x coordinate (v0=(0,5,0), e1=(1,0,0))
    u = np.asarray(ls.point[:, 0])
    bins = np.linspace(0, 1, 11)
    counts, _ = np.histogram(u, bins=bins)
    cdf = lambda x: 1 - (1 - x) ** 2  # density 2(1-u)
    expected = (cdf(bins[1:]) - cdf(bins[:-1])) * n
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < 27.9, (chi2, counts, expected)
