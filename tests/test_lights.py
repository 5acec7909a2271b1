import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.materials import Emissive, Lambertian
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import lights as light_ops

N = 2048


def u3(seed):
    u = jax.random.uniform(jax.random.key(seed), (N, 3))
    return u[:, 0], u[:, 1], u[:, 2]


def test_triangle_light_samples_on_surface():
    sc = scenes.cornell_box()
    from_point = jnp.broadcast_to(jnp.asarray([0.0, -0.5, -2.0]), (N, 3))
    usel, r1, r2 = u3(0)
    ls = light_ops.sample_light_point(sc, from_point, usel, r1, r2)
    p = np.asarray(ls.point)
    # Ceiling light plane y = 0.99, x,z within ±0.3 of (0,-2) (world.rs:167-182)
    np.testing.assert_allclose(p[:, 1], 0.99, atol=1e-5)
    assert (np.abs(p[:, 0]) <= 0.3 + 1e-5).all()
    assert (np.abs(p[:, 2] + 2.0) <= 0.3 + 1e-5).all()
    assert np.asarray(ls.pdf).min() > 0
    np.testing.assert_allclose(np.asarray(ls.emission), 15.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ls.dir), axis=1), 1.0, atol=1e-5)


def test_nee_pdf_divided_by_light_count_but_mis_query_not():
    """The reference divides the NEE pdf by num_lights (world.rs:260) but not
    the bsdf-side MIS pdf (rendering.rs:114-117). Both behaviors are load-bearing."""
    sc = scenes.cornell_box()
    from_point = jnp.broadcast_to(jnp.asarray([0.0, -0.5, -2.0]), (N, 3))
    usel, r1, r2 = u3(1)
    ls = light_ops.sample_light_point(sc, from_point, usel, r1, r2)
    q = light_ops.light_pdf_toward(
        sc,
        sc.light_prims[jnp.minimum((usel * sc.num_lights).astype(jnp.int32), sc.num_lights - 1)],
        from_point,
        ls.point,
    )
    np.testing.assert_allclose(np.asarray(ls.pdf) * sc.num_lights, np.asarray(q), rtol=1e-4)


def test_triangle_pdf_area_to_solid_angle():
    # Single unit-ish triangle light directly above: check pdf = d²/(A·cosθ)
    b = SceneBuilder()
    b.add_triangle((-1, 2, -1), (1, 2, -1), (-1, 2, 1), Emissive((1, 1, 1)))
    b.add_sphere((0, 0, 0), 0.1, Lambertian((1, 1, 1)))
    sc = b.build()
    from_point = jnp.zeros((N, 3))
    usel, r1, r2 = u3(2)
    ls = light_ops.sample_light_point(sc, from_point, usel, r1, r2)
    p = np.asarray(ls.point)
    d = np.linalg.norm(p, axis=1)
    cos = 2.0 / d  # light plane y=2, normal ±y, |cosθ| = 2/d
    area = 2.0
    np.testing.assert_allclose(np.asarray(ls.pdf), d * d / (area * cos), rtol=1e-4)


def test_sphere_light_cone_sampling():
    b = SceneBuilder()
    b.add_sphere((0, 5, 0), 1.0, Emissive((10, 10, 10)))
    b.add_sphere((0, -100, 0), 0.1, Lambertian((1, 1, 1)))
    sc = b.build()
    from_point = jnp.zeros((N, 3))
    usel, r1, r2 = u3(3)
    ls = light_ops.sample_light_point(sc, from_point, usel, r1, r2)
    p = np.asarray(ls.point)
    # Samples lie on the sphere surface (re-intersection, shape.rs:128-137)
    np.testing.assert_allclose(np.linalg.norm(p - [0, 5, 0], axis=1), 1.0, atol=1e-3)
    # Constant cone pdf 1/(2π(1-cosθmax)) (shape.rs:103-104)
    dist2 = 25.0
    cos_max = np.sqrt(1 - 1.0 / dist2)
    expected = 1.0 / (2 * np.pi * (1 - cos_max))
    np.testing.assert_allclose(np.asarray(ls.pdf), expected, rtol=1e-4)
    # All sampled points on the visible (front) hemisphere half-space
    assert (p[:, 1] <= 5.0 + 1e-4).all()


def test_two_lights_selection_balance():
    sc = scenes.cornell_box()  # two light triangles
    from_point = jnp.broadcast_to(jnp.asarray([0.0, -0.5, -2.0]), (N, 3))
    usel, r1, r2 = u3(4)
    ls = light_ops.sample_light_point(sc, from_point, usel, r1, r2)
    # Triangle 10 spans z in [-2.3, -1.7] with the diagonal split; both halves sampled
    z = np.asarray(ls.point)[:, 2]
    frac_low = (z < -2.0).mean()
    assert 0.4 < frac_low < 0.6
