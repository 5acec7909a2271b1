"""Pallas kernel equivalence vs the jnp bruteforce reference path.

On CPU the kernels run in interpreter mode (`method="pallas_interpret"`) —
the same kernel code the TPU compiles, executed by the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops.intersect import intersect


def random_rays(n, seed=0, spread=5.0, center=(0.0, 2.0, 0.0)):
    o = jax.random.uniform(jax.random.key(seed), (n, 3), minval=-spread, maxval=spread)
    o = o + jnp.asarray(center)
    d = jax.random.normal(jax.random.key(seed + 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize(
    "scene_fn", [scenes.cornell_box, lambda: scenes.many_spheres(n_per_side=4)]
)
def test_pallas_matches_bruteforce(scene_fn):
    sc = scene_fn()
    o, d = random_rays(700)
    hb = intersect(sc, o, d, 1e-3, jnp.inf, method="bruteforce")
    hp = intersect(sc, o, d, 1e-3, jnp.inf, method="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hp.prim))
    both = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hb.t)[both], np.asarray(hp.t)[both], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hb.normal)[both], np.asarray(hp.normal)[both], atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hb.mat)[both], np.asarray(hp.mat)[both])


def test_pallas_per_ray_tmax():
    sc = scenes.cornell_box()
    o, d = random_rays(300, seed=7, spread=0.9, center=(0, 0, -2))
    hb = intersect(sc, o, d, 1e-3, jnp.inf, method="bruteforce")
    # shadow-style query: cut the range just before each hit → all miss
    t_max = jnp.where(hb.valid, hb.t - 1e-3, 0.5)
    hp = intersect(sc, o, d, 1e-3, t_max, method="pallas_interpret")
    hb2 = intersect(sc, o, d, 1e-3, t_max, method="bruteforce")
    np.testing.assert_array_equal(np.asarray(hp.prim), np.asarray(hb2.prim))


def test_pallas_ragged_wave_sizes():
    sc = scenes.many_spheres(n_per_side=3)
    for n in (1, 7, 511, 513):
        o, d = random_rays(n, seed=n)
        hb = intersect(sc, o, d, 1e-3, jnp.inf, method="bruteforce")
        hp = intersect(sc, o, d, 1e-3, jnp.inf, method="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hp.prim))


def test_anyhit_matches_closesthit_validity():
    from pathtrace_tpu.ops.intersect import occluded
    sc = scenes.many_spheres(n_per_side=4)
    o, d = random_rays(700, seed=42)
    t_max = jnp.full((700,), 20.0)
    a = occluded(sc, o, d, 1e-3, t_max, method="bruteforce")
    b = occluded(sc, o, d, 1e-3, t_max, method="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ray_sorting_preserves_results():
    """Ray binning (sorted tracing for big meshes) is a pure permutation —
    results must be identical to unsorted tracing."""
    from pathtrace_tpu.models.scenes import mesh_scene
    from pathtrace_tpu.ops.intersect import intersect, occluded

    sc = mesh_scene(1000)  # small mesh; force sorting explicitly
    o, d = random_rays(600, seed=3, spread=3.0, center=(0, 1, 0))
    a = intersect(sc, o, d, 1e-3, jnp.inf, method="pallas_interpret", sort_rays=False)
    b = intersect(sc, o, d, 1e-3, jnp.inf, method="pallas_interpret", sort_rays=True)
    np.testing.assert_array_equal(np.asarray(a.prim), np.asarray(b.prim))
    np.testing.assert_allclose(np.asarray(a.t)[np.asarray(a.valid)],
                               np.asarray(b.t)[np.asarray(b.valid)], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.mat), np.asarray(b.mat))
