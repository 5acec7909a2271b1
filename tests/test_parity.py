"""Statistical parity vs the native C++ oracle.

The oracle (csrc/oracle.cpp) is an independent scalar/recursive/f64
implementation of the reference estimator spec. RNG streams differ by design,
so parity is statistical: per-pixel RMSE must be consistent with MC noise at
the chosen spp, and whole-image channel means (which average away per-pixel
noise) must agree tightly. Tolerances were calibrated from multi-seed runs:
at 64×64 the oracle's image-mean spread is ~5e-4 and the f32 wavefront's
≲3e-3; per-pixel noise RMSE ≈ σ₁/√spp with σ₁≈1.5 (diffuse) / ≈2.5 (glass).
"""

import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.models.materials import Emissive, Lambertian
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.oracle import render_oracle
from pathtrace_tpu.render import RenderConfig, render

W = H = 48


def cornell_diffuse():
    """Cornell variant with a grey Lambert sphere — low-variance parity scene."""
    b = SceneBuilder()
    s, d, ls = 1.0, -2.0, 0.3
    red = Lambertian((0.8, 0.1, 0.1)); green = Lambertian((0.1, 0.8, 0.1))
    blue = Lambertian((0.2, 0.2, 0.8)); cyan = Lambertian((0.2, 0.8, 0.8))
    white = Lambertian((0.8, 0.8, 0.8)); light = Emissive((15.0, 15.0, 15.0))
    grey = Lambertian((0.6, 0.6, 0.6))
    b.add_triangle((-s, -s, d - s), (-s, s, d - s), (-s, s, d + s), red)
    b.add_triangle((-s, -s, d - s), (-s, s, d + s), (-s, -s, d + s), red)
    b.add_triangle((s, -s, d - s), (s, s, d + s), (s, s, d - s), green)
    b.add_triangle((s, -s, d - s), (s, -s, d + s), (s, s, d + s), green)
    b.add_triangle((-s, -s, d - s), (s, -s, d - s), (s, s, d - s), blue)
    b.add_triangle((-s, -s, d - s), (s, s, d - s), (-s, s, d - s), blue)
    b.add_triangle((-s, -s, d - s), (s, -s, d + s), (s, -s, d - s), cyan)
    b.add_triangle((-s, -s, d - s), (-s, -s, d + s), (s, -s, d + s), cyan)
    b.add_triangle((-s, s, d - s), (s, s, d - s), (s, s, d + s), white)
    b.add_triangle((-s, s, d - s), (s, s, d + s), (-s, s, d + s), white)
    b.add_triangle((-ls, s - 0.01, d - ls), (ls, s - 0.01, d - ls), (ls, s - 0.01, d + ls), light)
    b.add_triangle((-ls, s - 0.01, d - ls), (ls, s - 0.01, d + ls), (-ls, s - 0.01, d + ls), light)
    b.add_sphere((0.4, -0.6, d), 0.4, grey)
    return b.build()


def _compare(scene, integrator, jax_spp, oracle_spp, mean_tol, rmse_tol):
    cam = scenes.cornell_camera(W, H)
    st = render(
        scene,
        cam,
        RenderConfig(
            width=W, height=H, spp=jax_spp, integrator=integrator,
            samples_per_batch=min(jax_spp, 32), seed=5,
        ),
    )
    jimg = np.asarray(st.image, np.float64)
    oimg = render_oracle(scene, cam, W, H, oracle_spp, integrator, seed=11)
    mean_diff = np.abs(jimg.mean(axis=(0, 1)) - oimg.mean(axis=(0, 1)))
    rmse = np.sqrt(((jimg - oimg) ** 2).mean())
    assert (mean_diff < mean_tol).all(), (mean_diff, rmse)
    assert rmse < rmse_tol, (mean_diff, rmse)


def cornell_sphere_light():
    """Diffuse Cornell lit by a small emissive sphere (the reference's
    commented-out variant, world.rs:184-190). Sphere-light cone pdfs are
    bounded, so NEE-only has no grazing-pdf fireflies — unlike the triangle
    light, where the 1e-8 pdf floor (shape.rs:238) spikes are only tamed by
    MIS weights, making NEE statistically incomparable at test spp."""
    b = SceneBuilder()
    s, d = 1.0, -2.0
    red = Lambertian((0.8, 0.1, 0.1)); green = Lambertian((0.1, 0.8, 0.1))
    blue = Lambertian((0.2, 0.2, 0.8)); cyan = Lambertian((0.2, 0.8, 0.8))
    white = Lambertian((0.8, 0.8, 0.8)); grey = Lambertian((0.6, 0.6, 0.6))
    b.add_triangle((-s, -s, d - s), (-s, s, d - s), (-s, s, d + s), red)
    b.add_triangle((-s, -s, d - s), (-s, s, d + s), (-s, -s, d + s), red)
    b.add_triangle((s, -s, d - s), (s, s, d + s), (s, s, d - s), green)
    b.add_triangle((s, -s, d - s), (s, -s, d + s), (s, s, d + s), green)
    b.add_triangle((-s, -s, d - s), (s, -s, d - s), (s, s, d - s), blue)
    b.add_triangle((-s, -s, d - s), (s, s, d - s), (-s, s, d - s), blue)
    b.add_triangle((-s, -s, d - s), (s, -s, d + s), (s, -s, d - s), cyan)
    b.add_triangle((-s, -s, d - s), (-s, -s, d + s), (s, -s, d + s), cyan)
    b.add_triangle((-s, s, d - s), (s, s, d - s), (s, s, d + s), white)
    b.add_triangle((-s, s, d - s), (s, s, d + s), (-s, s, d + s), white)
    b.add_sphere((0.0, s - 0.21, d), 0.2, Emissive((36.0, 36.0, 36.0)))
    b.add_sphere((0.4, -0.6, d), 0.4, grey)
    return b.build()


@pytest.mark.parametrize("integrator", ["brdf_only", "mis"])
def test_parity_diffuse(integrator):
    _compare(
        cornell_diffuse(), integrator,
        jax_spp=192, oracle_spp=1024,
        mean_tol=0.012, rmse_tol=0.18,
    )


def test_parity_nee_sphere_light():
    _compare(
        cornell_sphere_light(), "nee",
        jax_spp=192, oracle_spp=1024,
        mean_tol=0.015, rmse_tol=0.2,
    )


def test_parity_glass_mis():
    _compare(
        scenes.cornell_box(), "mis",
        jax_spp=192, oracle_spp=768,
        mean_tol=0.02, rmse_tol=0.5,  # glass fireflies dominate per-pixel RMSE
    )


def test_parity_oren_nayar():
    """Oren–Nayar lane vs the oracle: rough-diffuse Cornell walls."""
    from pathtrace_tpu.models.materials import OrenNayar

    b = SceneBuilder()
    s, d, ls = 1.0, -2.0, 0.3
    rough = OrenNayar((0.7, 0.4, 0.3), 0.5)
    grey = OrenNayar((0.6, 0.6, 0.6), 0.8)
    light = Emissive((15.0, 15.0, 15.0))
    b.add_triangle((-s, -s, d - s), (-s, s, d - s), (-s, s, d + s), rough)
    b.add_triangle((-s, -s, d - s), (-s, s, d + s), (-s, -s, d + s), rough)
    b.add_triangle((s, -s, d - s), (s, s, d + s), (s, s, d - s), rough)
    b.add_triangle((s, -s, d - s), (s, -s, d + s), (s, s, d + s), rough)
    b.add_triangle((-s, -s, d - s), (s, -s, d - s), (s, s, d - s), grey)
    b.add_triangle((-s, -s, d - s), (s, s, d - s), (-s, s, d - s), grey)
    b.add_triangle((-s, -s, d - s), (s, -s, d + s), (s, -s, d - s), grey)
    b.add_triangle((-s, -s, d - s), (-s, -s, d + s), (s, -s, d + s), grey)
    b.add_triangle((-s, s, d - s), (s, s, d - s), (s, s, d + s), grey)
    b.add_triangle((-s, s, d - s), (s, s, d + s), (-s, s, d + s), grey)
    b.add_triangle((-ls, s - 0.01, d - ls), (ls, s - 0.01, d - ls), (ls, s - 0.01, d + ls), light)
    b.add_triangle((-ls, s - 0.01, d - ls), (ls, s - 0.01, d + ls), (-ls, s - 0.01, d + ls), light)
    b.add_sphere((0.4, -0.6, d), 0.4, OrenNayar((0.5, 0.5, 0.7), 0.3))
    _compare(b.build(), "mis", jax_spp=128, oracle_spp=512, mean_tol=0.015, rmse_tol=0.2)


def test_pixel_79_176_anchor():
    """Single-pixel ground-truth anchor at the reference's own debug pixel.

    The reference's firefly investigation replays pixel (79, 176) of the
    400x400 default render and annotates an expected value "from the
    neighbor pixel" of ~(0.011, 0.145, 0.142) pre-gamma (world.rs:470-477).
    That literal is stale upstream: it describes a cyan surface, but the
    checked-out scene places the BLUE back wall at this pixel
    (world.rs:117-139), and both this renderer and the independent f64
    oracle agree on a blue value there. The anchor we pin is renderer ==
    oracle at this exact pixel (the reference's own per-pixel replay
    methodology, world.rs:377-478, turned into an assertion); the windowed
    oracle render is bitwise-equal to the same pixel of a full-frame pass.
    """
    from pathtrace_tpu.debug import render_pixel_samples
    from pathtrace_tpu.oracle import render_oracle_window

    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(400, 400)
    ours = np.asarray(
        render_pixel_samples(
            sc, cam, 79, 176, width=400, height=400, spp=2048,
            integrator="mis", max_bounces=64, seed=0,
        )
    ).mean(axis=0)
    oracle = render_oracle_window(
        sc, cam, 400, 400, 79, 176, 1, 1, 2048, integrator="mis", seed=0
    )[0, 0]
    # Blue back wall: B dominant, R/G low — the stale upstream literal
    # (cyan, G≈B≫R) would fail this shape check.
    assert oracle[2] > 2.5 * oracle[0] and oracle[2] > 2.5 * oracle[1]
    # MC noise at 2048 spp for this pixel is ~0.003-0.005 per channel.
    np.testing.assert_allclose(ours, oracle, atol=0.02, rtol=0.12)


def test_golden_oracle_artifact():
    """Golden-image regression anchor (when the pinned artifact exists).

    tests/golden/oracle_cornell_400_mis_8192.npz pins a full 400x400
    f64-oracle render of the reference workload at 8192 spp (noise floor
    0.5/sqrt(8192) ~ 0.0055 < the 1e-2 BASELINE budget). The cheap CI check
    re-renders a small window of the SAME frame with the current oracle and
    asserts bitwise equality — any estimator/oracle regression trips it
    without re-deriving statistical tolerances. The full-frame TPU-vs-golden
    RMSE measurement lives in docs/PARITY.md.
    """
    import os

    from pathtrace_tpu.oracle import render_oracle_window

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "oracle_cornell_400_mis_8192.npz")
    if not os.path.exists(path):
        pytest.skip("golden artifact not generated yet")
    golden = np.load(path)["image"]
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(400, 400)
    win = render_oracle_window(sc, cam, 400, 400, 190, 240, 8, 4, 8192,
                               integrator="mis", seed=0)
    np.testing.assert_array_equal(win, golden[240:244, 190:198])
