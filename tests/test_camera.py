import dataclasses

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.camera import Camera
from pathtrace_tpu.models.scenes import cornell_camera


def center_jitter(n):
    return jnp.full((n, 2), 0.5)


def test_center_ray_points_down_z():
    cam = Camera.perspective((0.0, 0.0, 2.0), 401, 401, 1.0, 35.0)
    # pixel (200,200) with jitter 0.5 → u=v=0.5 + half-pixel; use exact center
    o, d = cam.generate_rays(jnp.asarray([200]), jnp.asarray([200]), jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)


def test_unit_directions_and_reference_mapping():
    cam = cornell_camera(400, 400)
    px = jnp.asarray([0, 399, 123])
    py = jnp.asarray([0, 399, 272])
    o, d = cam.generate_rays(px, py, jnp.zeros((3, 2)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-6)
    # u=(x+ox)/(w-1): pixel (0,0) jitter 0 maps to the lower-left corner exactly
    expected = np.asarray(cam.lower_left_corner) - np.asarray(cam.origin)
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(np.asarray(d[0]), expected, atol=1e-6)


def test_vertical_fov_quirk():
    # The FOV parameter drives viewport *height*; width = height*aspect
    # (camera.rs:61-62) even though the parameter is named horizontal.
    cam = Camera.perspective((0, 0, 0), 800, 400, 1.0, 90.0)
    h = np.asarray(cam.horizontal)
    v = np.asarray(cam.vertical)
    assert abs(np.linalg.norm(v) - 2.0) < 1e-6      # 2*tan(45°)*1
    assert abs(np.linalg.norm(h) - 4.0) < 1e-6      # height * aspect(2)


def test_look_at_matches_perspective_for_axis_setup():
    p = Camera.perspective((0.0, 0.0, 2.0), 100, 100, 1.0, 35.0)
    la = Camera.look_at((0.0, 0.0, 2.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 100, 100, 35.0)
    px = jnp.arange(5) * 20
    py = jnp.arange(5) * 17
    _, d1 = p.generate_rays(px, py, center_jitter(5))
    _, d2 = la.generate_rays(px, py, center_jitter(5))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
