"""Counter-based RNG discipline tests: reproducibility and independence."""

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.utils import rng


def test_reproducible_across_batching():
    """The same (pixel, sample, bounce) coordinate yields the same uniforms no
    matter how rays are batched — the property that replaces the reference's
    per-pixel sequential StdRng (main.rs:49-52) on a wave scheduler."""
    key = rng.base_key(42)
    all_pix = jnp.arange(100, dtype=jnp.int32)
    ks_all = rng.pixel_sample_keys(key, all_pix, 7)
    u_all = rng.bounce_uniforms(ks_all, 3)

    sub = jnp.asarray([17, 3, 99], dtype=jnp.int32)
    ks_sub = rng.pixel_sample_keys(key, sub, 7)
    u_sub = rng.bounce_uniforms(ks_sub, 3)

    np.testing.assert_array_equal(np.asarray(u_all)[[17, 3, 99]], np.asarray(u_sub))


def test_independent_axes():
    key = rng.base_key(0)
    pix = jnp.arange(64, dtype=jnp.int32)
    a = rng.bounce_uniforms(rng.pixel_sample_keys(key, pix, 0), 0)
    b = rng.bounce_uniforms(rng.pixel_sample_keys(key, pix, 1), 0)  # other sample
    c = rng.bounce_uniforms(rng.pixel_sample_keys(key, pix, 0), 1)  # other bounce
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)


def test_uniform_range_and_mean():
    key = rng.base_key(123)
    pix = jnp.arange(4096, dtype=jnp.int32)
    u = np.asarray(rng.bounce_uniforms(rng.pixel_sample_keys(key, pix, 0), 0))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01


def test_primary_jitter_distinct_from_bounce_draws():
    key = rng.base_key(9)
    pix = jnp.arange(128, dtype=jnp.int32)
    ks = rng.pixel_sample_keys(key, pix, 0)
    j = rng.primary_jitter(ks)
    u0 = rng.bounce_uniforms(ks, 0)
    assert j.shape == (128, 2)
    assert not np.allclose(np.asarray(j), np.asarray(u0[:, :2]))
