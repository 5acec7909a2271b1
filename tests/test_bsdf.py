"""BSDF lane invariants: energy conservation (white furnace), sampler/pdf
consistency, and limit behaviors — the tests the reference lacks (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.materials import Emissive, Lambertian, Mirror, OrenNayar
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.ops import bsdf as bsdf_ops
from pathtrace_tpu.utils import vec

N = 4096


def scene_with(m):
    return SceneBuilder().add_sphere((0, 0, 0), 1.0, m).build()


def wave(scene, mat_id=0):
    mid = jnp.full((N,), mat_id, jnp.int32)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    return mid, normal


def uniforms(seed):
    u = jax.random.uniform(jax.random.key(seed), (N, 3))
    return u[:, 0], u[:, 1], u[:, 2]


def view_dirs(seed, cos_min=0.1):
    u = jax.random.uniform(jax.random.key(seed), (N, 2))
    ct = cos_min + (1 - cos_min) * u[:, 0]
    st = jnp.sqrt(1 - ct * ct)
    phi = 2 * jnp.pi * u[:, 1]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def test_lambert_weight_is_albedo():
    # cosine pdf cancels exactly: bsdf*cos/pdf == albedo per sample (material.rs:86-122)
    sc = scene_with(Lambertian((0.8, 0.1, 0.1)))
    mid, normal = wave(sc)
    i = view_dirs(0)
    r1, r2, uc = uniforms(1)
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, i, jnp.ones(N), normal, r1, r2, uc)
    w = np.asarray(f * (cos / pdf)[:, None])
    np.testing.assert_allclose(w, np.tile([0.8, 0.1, 0.1], (N, 1)), rtol=1e-4)


def test_cosine_sampler_moment():
    sc = scene_with(Lambertian((1, 1, 1)))
    mid, normal = wave(sc)
    r1, r2, uc = uniforms(2)
    o, *_ = bsdf_ops.sample_bsdf(sc, mid, view_dirs(3), jnp.ones(N), normal, r1, r2, uc)
    # E[cosθ] = 2/3 for cosine-weighted hemisphere
    assert abs(float(vec.dot(o, normal).mean()) - 2.0 / 3.0) < 0.02


def test_emissive_lane_terminal():
    sc = scene_with(Emissive((5.0, 5.0, 5.0)))
    mid, normal = wave(sc)
    r1, r2, uc = uniforms(4)
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, view_dirs(5), jnp.ones(N), normal, r1, r2, uc)
    assert float(jnp.abs(f).max()) == 0.0
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
    np.testing.assert_allclose(np.asarray(cos), 0.0)
    e = bsdf_ops.emitted(sc, mid)
    np.testing.assert_allclose(np.asarray(e), 5.0)


def test_metal_furnace_bounded():
    # White rough metal: E[f·cos/pdf] = G2/G1 ∈ (0,1]; VNDF keeps the weight
    # tightly below 1 (mirror.rs:241-268).
    sc = scene_with(Mirror(roughness=0.5, color=(1, 1, 1), metallic=1.0))
    mid, normal = wave(sc)
    r1, r2, uc = uniforms(6)
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, view_dirs(7, 0.3), jnp.ones(N), normal, r1, r2, uc)
    w = np.asarray(f[:, 0] * cos / pdf)
    assert np.isfinite(w).all()
    assert w.max() <= 1.0 + 1e-4
    assert 0.7 < w.mean() <= 1.0


def test_smooth_metal_reflects_specularly():
    sc = scene_with(Mirror(roughness=0.01, color=(1, 1, 1), metallic=1.0))
    mid, normal = wave(sc)
    i = view_dirs(8, 0.3)
    r1, r2, uc = uniforms(9)
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, i, jnp.ones(N), normal, r1, r2, uc)
    mirror_dir = vec.reflect(-i, normal)
    dots = np.asarray(vec.dot(o, mirror_dir))
    assert np.quantile(dots, 0.05) > 0.999  # within ~2.5° for 95% of samples


def test_dielectric_both_branches_and_energy():
    sc = scene_with(Mirror(roughness=0.3, metallic=0.0, ior=1.5))
    mid, normal = wave(sc)
    i = view_dirs(10, 0.2)
    r1, r2, uc = uniforms(11)
    eta = jnp.full((N,), 1.0 / 1.5)  # entering glass
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, i, eta, normal, r1, r2, uc)
    on = np.asarray(vec.dot(o, normal))
    assert (on > 0).any() and (on < 0).any()  # both reflection and refraction occur
    w = np.asarray(f * (cos / pdf)[:, None])
    assert np.isfinite(w).all()
    # Energy per sample stays bounded (weight = throughput multiplier)
    assert np.quantile(w[:, 0], 0.99) < 1.5
    assert 0.5 < w[:, 0].mean() < 1.1


def test_eval_sample_pdf_consistency_diffuse():
    sc = scene_with(OrenNayar((0.6, 0.6, 0.6), 0.4))
    mid, normal = wave(sc)
    i = view_dirs(12)
    r1, r2, uc = uniforms(13)
    o, f, pdf, cos = bsdf_ops.sample_bsdf(sc, mid, i, jnp.ones(N), normal, r1, r2, uc)
    f2, pdf2 = bsdf_ops.eval_bsdf(sc, mid, i, jnp.ones(N), o, normal)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), rtol=1e-4)


def test_oren_nayar_zero_roughness_is_lambert():
    sc = (
        SceneBuilder()
        .add_sphere((0, 0, 0), 1.0, OrenNayar((0.7, 0.5, 0.3), 0.0))
        .add_sphere((5, 0, 0), 1.0, Lambertian((0.7, 0.5, 0.3)))
        .build()
    )
    mid_on, normal = wave(sc, 0)
    mid_lam = jnp.full((N,), 1, jnp.int32)
    i = view_dirs(14)
    o = view_dirs(15)
    f1, p1 = bsdf_ops.eval_bsdf(sc, mid_on, i, jnp.ones(N), o, normal)
    f2, p2 = bsdf_ops.eval_bsdf(sc, mid_lam, i, jnp.ones(N), o, normal)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_mirror_eval_reflection_pdf_positive():
    sc = scene_with(Mirror(roughness=0.3, metallic=0.0, ior=1.5))
    mid, normal = wave(sc)
    i = view_dirs(16, 0.3)
    o = view_dirs(17, 0.3)
    f, pdf = bsdf_ops.eval_bsdf(sc, mid, i, jnp.ones(N), o, normal)
    assert np.asarray(pdf).min() > 0
    assert np.isfinite(np.asarray(f)).all()


def test_metal_blocks_transmission():
    sc = scene_with(Mirror(roughness=0.3, color=(1, 1, 1), metallic=1.0))
    mid, normal = wave(sc)
    i = view_dirs(18, 0.3)
    o = -view_dirs(19, 0.3)  # transmission side
    f, pdf = bsdf_ops.eval_bsdf(sc, mid, i, jnp.ones(N), o, normal)
    np.testing.assert_allclose(np.asarray(f), 0.0)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
