"""Unit tests for the batched vector math layer.

Ports all 18 reference math tests (math.rs:246-418) to the batched API, plus
batch-shape and mask-semantics checks the reference could not express.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.utils import vec


def v(*xyz):
    return jnp.asarray(xyz, dtype=jnp.float32)


class TestReferenceParity:
    # math.rs:250-256
    def test_creation(self):
        a = v(1.0, 2.0, 3.0)
        assert a[0] == 1.0 and a[1] == 2.0 and a[2] == 3.0

    # math.rs:258-264
    def test_add(self):
        np.testing.assert_allclose(v(1, 2, 3) + v(4, 5, 6), v(5, 7, 9))

    # math.rs:266-272
    def test_sub(self):
        np.testing.assert_allclose(v(4, 5, 6) - v(1, 2, 3), v(3, 3, 3))

    # math.rs:274-279
    def test_mul_scalar(self):
        np.testing.assert_allclose(v(1, 2, 3) * 2.0, v(2, 4, 6))

    # math.rs:281-286
    def test_scalar_mul(self):
        np.testing.assert_allclose(2.0 * v(1, 2, 3), v(2, 4, 6))

    # math.rs:288-294 (Hadamard)
    def test_mul_vector(self):
        np.testing.assert_allclose(v(1, 2, 3) * v(2, 3, 4), v(2, 6, 12))

    # math.rs:296-301
    def test_div_scalar(self):
        np.testing.assert_allclose(v(2, 4, 6) / 2.0, v(1, 2, 3))

    # math.rs:303-308
    def test_neg(self):
        np.testing.assert_allclose(-v(1, -2, 3), v(-1, 2, -3))

    # math.rs:310-316
    def test_dot(self):
        assert float(vec.dot(v(1, 2, 3), v(4, 5, 6))) == 32.0

    # math.rs:318-324
    def test_cross(self):
        np.testing.assert_allclose(vec.cross(v(1, 0, 0), v(0, 1, 0)), v(0, 0, 1))

    # math.rs:326-330
    def test_length(self):
        assert float(vec.length(v(3, 4, 0))) == 5.0

    # math.rs:332-338
    def test_normalize(self):
        n = vec.normalize(v(3, 4, 0))
        assert abs(float(vec.length(n)) - 1.0) < 1e-6
        np.testing.assert_allclose(n, v(0.6, 0.8, 0.0), atol=1e-7)

    # math.rs:340-346
    def test_normalize_zero_passthrough(self):
        np.testing.assert_allclose(vec.normalize(v(0, 0, 0)), v(0, 0, 0))

    # math.rs:349-361
    def test_normal_from_triangle(self):
        n = vec.normal_from_triangle(v(0, 0, 0), v(1, 0, 0), v(0, 1, 0))
        np.testing.assert_allclose(n, v(0, 0, 1), atol=1e-6)

    # math.rs:364-375
    def test_reflect(self):
        incident = vec.normalize(v(1, -1, 0))
        reflected = vec.reflect(incident, v(0, 1, 0))
        expected = vec.normalize(v(1, 1, 0))
        np.testing.assert_allclose(reflected, expected, atol=1e-6)

    # math.rs:377-390
    def test_refract(self):
        refracted, valid = vec.refract(v(0, -1, 0), v(0, 1, 0), 1.0 / 1.5)
        assert bool(valid)
        assert abs(float(refracted[0])) < 1e-6
        assert float(refracted[1]) < 0.0

    # math.rs:393-402 — total internal reflection becomes a False mask
    def test_refract_tir(self):
        incident = vec.normalize(v(0.8, -0.6, 0.0))
        _, valid = vec.refract(incident, v(0, 1, 0), 1.5)
        assert not bool(valid)

    # math.rs:404-417
    def test_face_forward(self):
        n = v(0, 1, 0)
        np.testing.assert_allclose(vec.face_forward(n, v(0, -1, 0)), n)
        np.testing.assert_allclose(vec.face_forward(n, v(0, 1, 0)), -n)


class TestBatched:
    def test_batched_shapes(self):
        a = jnp.ones((5, 7, 3))
        b = jnp.ones((5, 7, 3)) * 2
        assert vec.dot(a, b).shape == (5, 7)
        assert vec.cross(a, b).shape == (5, 7, 3)
        assert vec.normalize(a).shape == (5, 7, 3)
        assert vec.luminance(a).shape == (5, 7)

    def test_refract_mixed_mask(self):
        incident = jnp.stack(
            [vec.normalize(v(0.8, -0.6, 0.0)), v(0.0, -1.0, 0.0)]
        )
        normal = jnp.broadcast_to(v(0, 1, 0), (2, 3))
        _, valid = vec.refract(incident, normal, jnp.asarray([1.5, 1.5]))
        assert not bool(valid[0]) and bool(valid[1])

    def test_luminance_rec709(self):
        assert abs(float(vec.luminance(v(1, 1, 1))) - 1.0) < 1e-6
        assert abs(float(vec.luminance(v(1, 0, 0))) - 0.2126) < 1e-6

    def test_tangent_frame_orthonormal(self):
        normals = vec.normalize(
            jnp.asarray(
                [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 2.0, 3.0], [0.0, 0.9999, 0.01]],
                dtype=jnp.float32,
            )
        )
        t, b = vec.tangent_frame(normals)
        np.testing.assert_allclose(vec.dot(t, normals), 0.0, atol=1e-6)
        np.testing.assert_allclose(vec.dot(b, normals), 0.0, atol=1e-6)
        np.testing.assert_allclose(vec.dot(t, b), 0.0, atol=1e-6)
        np.testing.assert_allclose(vec.length(t), 1.0, atol=1e-5)
        np.testing.assert_allclose(vec.length(b), 1.0, atol=1e-5)

    def test_tangent_frame_up_fallback(self):
        # |n.y| > 0.999 must switch the up vector to +X (math.rs:116-120)
        t, _ = vec.tangent_frame(v(0.0, 1.0, 0.0))
        # up=(1,0,0): tangent = normalize(up x n) = (0,0,-1)... cross((1,0,0),(0,1,0)) = (0,0,1)
        np.testing.assert_allclose(t, v(0, 0, 1), atol=1e-6)

    def test_cosine_hemisphere_above_surface(self):
        n = vec.normalize(jnp.broadcast_to(v(1, 2, -1), (64, 3)))
        r = np.random.default_rng(0)
        d = vec.cosine_hemisphere_direction(
            n, jnp.asarray(r.random(64), jnp.float32), jnp.asarray(r.random(64), jnp.float32)
        )
        assert bool(jnp.all(vec.dot(d, n) >= -1e-6))
        np.testing.assert_allclose(vec.length(d), 1.0, atol=1e-5)

    def test_finite_or_zero(self):
        a = jnp.asarray([1.0, jnp.inf, -jnp.inf, jnp.nan])
        np.testing.assert_allclose(vec.finite_or_zero(a), [1.0, 0, 0, 0])
