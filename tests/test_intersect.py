import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.materials import Lambertian
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops.intersect import intersect, occluded


def rays(*pairs):
    o = jnp.asarray([p[0] for p in pairs], jnp.float32)
    d = jnp.asarray([p[1] for p in pairs], jnp.float32)
    return o, d


def test_sphere_hit_and_range():
    sc = SceneBuilder().add_sphere((0, 0, -5), 1.0, Lambertian((1, 1, 1))).build()
    o, d = rays(
        (((0, 0, 0)), (0, 0, -1)),   # head-on → t=4
        (((0, 0, 0)), (0, 0, 1)),    # away → miss
        (((0, 0, -5)), (0, 0, -1)),  # from inside → exits at t=1 (far root)
        (((0, 3, 0)), (0, 0, -1)),   # offset → miss
    )
    h = intersect(sc, o, d, 1e-3, jnp.inf)
    np.testing.assert_allclose(np.asarray(h.t)[[0, 2]], [4.0, 1.0], atol=1e-5)
    assert list(np.asarray(h.valid)) == [True, False, True, False]
    # front_face: outside hit True, inside hit False with flipped normal (base.rs:19-33)
    assert bool(h.front_face[0]) and not bool(h.front_face[2])
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[2]), [0, 0, 1], atol=1e-5)


def test_sphere_tmax_skips_to_far_root():
    sc = SceneBuilder().add_sphere((0, 0, -5), 1.0, Lambertian((1, 1, 1))).build()
    o, d = rays((((0, 0, 0)), (0, 0, -1)))
    # t_min beyond the near root (4) → the far root (6) must be taken (shape.rs:76-81)
    h = intersect(sc, o, d, 5.0, jnp.inf)
    np.testing.assert_allclose(float(h.t[0]), 6.0, atol=1e-5)


def test_triangle_hit_barycentric_and_parallel():
    sc = (
        SceneBuilder()
        .add_triangle((0, 0, -2), (2, 0, -2), (0, 2, -2), Lambertian((1, 1, 1)))
        .build()
    )
    o, d = rays(
        (((0.5, 0.5, 0)), (0, 0, -1)),   # inside
        (((1.5, 1.5, 0)), (0, 0, -1)),   # outside (u+v>1)
        (((-0.1, 0.5, 0)), (0, 0, -1)),  # outside (u<0)
        (((0.5, 0.5, 0)), (1, 0, 0)),    # parallel to plane
        (((0, 0, 0)), (0, 0, -1)),       # vertex hit (u=v=0 inclusive)
    )
    h = intersect(sc, o, d, 1e-3, jnp.inf)
    assert list(np.asarray(h.valid)) == [True, False, False, False, True]
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)


def test_closest_hit_across_prim_kinds():
    sc = (
        SceneBuilder()
        .add_triangle((-5, -5, -3), (5, -5, -3), (0, 5, -3), Lambertian((1, 0, 0)))
        .add_sphere((0, 0, -6), 1.0, Lambertian((0, 1, 0)))
        .build()
    )
    o, d = rays((((0, 0, 0)), (0, 0, -1)))
    h = intersect(sc, o, d, 1e-3, jnp.inf)
    assert int(h.prim[0]) == 0  # triangle at t=3 in front of sphere at t=5
    h2 = intersect(sc, o, d, 4.0, jnp.inf)
    assert int(h2.prim[0]) == 1  # skipping the triangle finds the sphere


def test_occlusion_window():
    sc = SceneBuilder().add_sphere((0, 0, -5), 1.0, Lambertian((1, 1, 1))).build()
    o, d = rays((((0, 0, 0)), (0, 0, -1)))
    assert bool(occluded(sc, o, d, 1e-3, jnp.asarray([10.0]))[0])
    # shadow window ends before the sphere → visible
    assert not bool(occluded(sc, o, d, 1e-3, jnp.asarray([3.5]))[0])


def test_tile_size_invariance():
    sc = scenes.cornell_box()
    key = jax.random.key(0)
    o = jax.random.uniform(key, (256, 3), minval=-0.9, maxval=0.9) + jnp.asarray([0, 0, -2.0])
    d = jax.random.normal(jax.random.key(1), (256, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    h1 = intersect(sc, o, d, 1e-3, jnp.inf, tile=4)
    h2 = intersect(sc, o, d, 1e-3, jnp.inf, tile=1024)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)


def test_cornell_scene_structure():
    sc = scenes.cornell_box()
    assert sc.num_tris == 12 and sc.num_spheres == 1
    assert sc.num_lights == 2
    # Light prims point at the two emissive ceiling triangles (y = 0.99);
    # primitive order itself is morton-sorted, so ids are not fixed.
    from pathtrace_tpu.models.materials import KIND_EMISSIVE
    for p in np.asarray(sc.light_prims):
        assert p < sc.num_tris
        assert int(sc.mat_kind[int(sc.tri_mat[p])]) == KIND_EMISSIVE
        assert abs(float(sc.tri_v0[p][1]) - 0.99) < 1e-6


def test_mxu_method_matches_bruteforce():
    """The experimental matmul (MXU) formulation must agree with the VPU path."""
    sc = scenes.many_spheres(n_per_side=4)
    key = jax.random.key(5)
    o = jax.random.uniform(key, (256, 3), minval=-5, maxval=5) + jnp.asarray([0, 2, 0.0])
    d = jax.random.normal(jax.random.key(6), (256, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    hb = intersect(sc, o, d, 1e-3, jnp.inf, method="bruteforce")
    hm = intersect(sc, o, d, 1e-3, jnp.inf, method="mxu")
    np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hm.prim))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(hm.t)[m], rtol=1e-4)


def test_binned_method_matches_bruteforce():
    """Per-ray binned traversal (ops/binned_intersect.py) must produce the
    identical closest hits and occlusion as the bruteforce scan — same MT
    math, different traversal order (the TPU analog of the reference's
    per-ray recursion, world.rs:270-290)."""
    import jax
    import numpy as np

    from pathtrace_tpu.models import scenes

    scene = scenes.mesh_scene(n_tris=2500)
    key = jax.random.PRNGKey(9)
    n = 4096  # exercises one cascade compaction (n // 4 < 4096)
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    hb = intersect(scene, o, d, 1e-3, jnp.inf, method="bruteforce")
    hp = intersect(scene, o, d, 1e-3, jnp.inf, method="binned_interpret")
    np.testing.assert_array_equal(np.asarray(hp.prim), np.asarray(hb.prim))
    v = np.asarray(hb.prim >= 0)
    # Triangle t is bit-identical (same MT math); sphere lanes carry the
    # pallas quadratic's k=|c|^2-r^2 association difference (~5e-4).
    tri_lane = v & (np.asarray(hb.prim) < scene.tri_v0.shape[0])
    np.testing.assert_allclose(
        np.asarray(hp.t)[tri_lane], np.asarray(hb.t)[tri_lane], rtol=0, atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(hp.t)[v], np.asarray(hb.t)[v], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(hp.front_face)[v], np.asarray(hb.front_face)[v]
    )

    ob = occluded(scene, o, d, 1e-3, 2.5, method="bruteforce")
    op = occluded(scene, o, d, 1e-3, 2.5, method="binned_interpret")
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))


def test_resident_method_matches_bruteforce():
    """Resident-table persistent traversal (ops/resident_intersect.py) must
    produce identical closest hits and occlusion as the bruteforce scan —
    same MT math, in-kernel per-ray front-to-back order."""
    import jax
    import numpy as np

    from pathtrace_tpu.models import scenes

    scene = scenes.mesh_scene(n_tris=2500)
    key = jax.random.PRNGKey(9)
    n = 2048  # 2 ray tiles, 8 subtiles each
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    hb = intersect(scene, o, d, 1e-3, jnp.inf, method="bruteforce")
    hp = intersect(scene, o, d, 1e-3, jnp.inf, method="resident_interpret")
    np.testing.assert_array_equal(np.asarray(hp.prim), np.asarray(hb.prim))
    v = np.asarray(hb.prim >= 0)
    tri_lane = v & (np.asarray(hb.prim) < scene.tri_v0.shape[0])
    np.testing.assert_allclose(
        np.asarray(hp.t)[tri_lane], np.asarray(hb.t)[tri_lane], rtol=0,
        atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(hp.t)[v], np.asarray(hb.t)[v], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(hp.front_face)[v], np.asarray(hb.front_face)[v]
    )

    ob = occluded(scene, o, d, 1e-3, 2.5, method="bruteforce")
    op = occluded(scene, o, d, 1e-3, 2.5, method="resident_interpret")
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))


def test_pool_render_method_invariance():
    """End-to-end render must be bitwise-identical between the per-tile and
    per-ray-binned kernel traversals (same intersection math, different
    traversal order): any divergence is a traversal bug. This is the
    cross-check that exposed round 1's silently-wrong argsort reorder
    (docs/PERFORMANCE.md, mesh section).

    The bruteforce path is held to a small tolerance instead: its quadratic
    uses a = d·d while the kernels assume unit directions (a == 1), so
    near-tangent sphere tests can differ by ulps — sub-ulp t disagreements
    that occasionally flip a shadow bit. (Round 2's version of this test
    compared bruteforce bitwise and "passed" only because set_default_method
    didn't invalidate jit caches — both renders silently ran the same
    compiled program. The cache-clearing fix exposed it.)"""
    import numpy as np

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.ops.intersect import set_default_method
    from pathtrace_tpu.render import RenderConfig, render

    scene = scenes.mesh_scene(n_tris=1500)
    cam = scenes.mesh_scene_camera(32, 32)
    cfg = RenderConfig(width=32, height=32, spp=2, integrator="mis",
                       max_bounces=3, seed=0, samples_per_batch=2)
    try:
        img_brute = np.asarray(render(scene, cam, cfg).image)
        set_default_method("pallas_interpret")
        img_tile = np.asarray(render(scene, cam, cfg).image)
        set_default_method("binned_interpret")
        img_binned = np.asarray(render(scene, cam, cfg).image)
        set_default_method("bvh_interpret")
        img_bvh = np.asarray(render(scene, cam, cfg).image)
    finally:
        set_default_method(None)
    # Near-ulp tolerance, not bitwise: on a closed mesh a ray can hit a
    # shared edge exactly (inclusive barycentric bounds) — both adjacent
    # triangles report the same t and the winning prim (hence its normal)
    # depends on cluster visit order, which differs between traversals.
    # Round 1's reorder bug was a >10% image shift; 1e-5 still catches it.
    np.testing.assert_allclose(img_tile, img_binned, rtol=1e-5, atol=1e-5)
    # The BVH route defaults to the MXU Möller–Trumbore form (round 5):
    # its determinants agree with the VPU chain to ~1e-7 relative, so a
    # handful of knife-edge samples (shared-edge / grazing hits) may flip
    # and legitimately diverge a whole path — the documented determinism
    # contract. Tolerance-with-outlier-budget, same as the cross-compile
    # image tests (tests/imgutil.py).
    from tests.imgutil import assert_images_match

    assert_images_match(img_bvh, img_tile, rtol=1e-5, atol=1e-5,
                        max_outliers=3)
    np.testing.assert_allclose(img_brute, img_binned, rtol=2e-3, atol=2e-3)


def test_resolve_auto_coherence_hints(monkeypatch):
    """"auto" routes big-triangle scenes to the BVH union sweep on EVERY wave
    class (round-4 in-pool measurements: bvh > pallas flat > binned on
    primary, bounce, and mixed pool waves alike), keeps the platform default
    for small scenes, and an explicit set_default_method override wins."""
    from pathtrace_tpu.ops import intersect as im

    monkeypatch.setattr(im, "default_method", lambda: "pallas")
    big = im.RAY_SORT_MIN_TRIS
    assert im.resolve_auto("auto", big, False) == im.BIG_TRI_METHOD
    assert im.resolve_auto("auto", big, True) == im.BIG_TRI_METHOD
    assert im.resolve_auto("auto", big, None) == im.BIG_TRI_METHOD
    assert im.resolve_auto("auto", big - 1, False) == "pallas"
    # Explicit method requests pass through untouched.
    assert im.resolve_auto("resident", big, False) == "resident"
    # Interpreter default keeps the hint family in interpret mode.
    monkeypatch.setattr(im, "default_method", lambda: "pallas_interpret")
    assert im.resolve_auto("auto", big, False) == (
        im.BIG_TRI_METHOD + "_interpret"
    )
    # A process-wide override beats the hint.
    monkeypatch.setattr(im, "_METHOD_OVERRIDE", "pallas")
    monkeypatch.setattr(im, "default_method", lambda: "pallas")
    assert im.resolve_auto("auto", big, False) == "pallas"


@pytest.mark.slow
def test_bvh_method_matches_bruteforce():
    """Two-level union-sweep traversal (ops/bvh_intersect.py) must produce
    identical closest hits and occlusion as the bruteforce scan — same MT
    math, hierarchical per-ray front-to-back order with bound gating."""
    import jax
    import numpy as np

    from pathtrace_tpu.models import scenes

    scene = scenes.mesh_scene(n_tris=2500)
    key = jax.random.PRNGKey(11)
    n = 2048  # 2 ray tiles, 8 subtiles each
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    hb = intersect(scene, o, d, 1e-3, jnp.inf, method="bruteforce")
    hp = intersect(scene, o, d, 1e-3, jnp.inf, method="bvh_interpret")
    np.testing.assert_array_equal(np.asarray(hp.prim), np.asarray(hb.prim))
    v = np.asarray(hb.prim >= 0)
    tri_lane = v & (np.asarray(hb.prim) < scene.tri_v0.shape[0])
    np.testing.assert_allclose(
        np.asarray(hp.t)[tri_lane], np.asarray(hb.t)[tri_lane], rtol=0,
        atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(hp.t)[v], np.asarray(hb.t)[v], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(hp.front_face)[v], np.asarray(hb.front_face)[v]
    )

    ob = occluded(scene, o, d, 1e-3, 2.5, method="bruteforce")
    op = occluded(scene, o, d, 1e-3, 2.5, method="bvh_interpret")
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))


@pytest.mark.slow
def test_bvh_streamed_matches_resident_table():
    """The HBM-streamed BVH variant (one DMA per visited supergroup) must be
    bitwise-identical to the VMEM-resident-table form — same traversal, only
    the table transport differs."""
    import jax
    import numpy as np

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.ops import bvh_intersect as bv

    scene = scenes.mesh_scene(n_tris=2500)
    key = jax.random.PRNGKey(5)
    n = 1024
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    args = (o, d, 1e-3, jnp.inf, scene.tri_v0, scene.tri_e1, scene.tri_e2,
            scene.tri_normal, scene.tri_mat)
    a = bv.triangle_closest_bvh(*args, interpret=True, stream=False)
    b = bv.triangle_closest_bvh(*args, interpret=True, stream=True)
    for x, y, name in zip(a, b, ("t", "idx", "normal", "mat")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
    oa = bv.triangle_anyhit_bvh(o, d, 1e-3, 2.5, scene.tri_v0, scene.tri_e1,
                                scene.tri_e2, interpret=True, stream=False)
    ob = bv.triangle_anyhit_bvh(o, d, 1e-3, 2.5, scene.tri_v0, scene.tri_e1,
                                scene.tri_e2, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_bvh_mxu_matches_vpu_form():
    """The MXU Möller–Trumbore determinant path (round 5) must agree with
    the VPU chain everywhere off the documented knife edges: identical
    winning prims on this random soup (the bf16-split dot error is ~1e-7
    relative — acceptance flips need a pair within that of an edge), hit t
    to the split-dot tolerance, and bitwise equality between its own
    resident and streamed coefficient transports."""
    import numpy as np

    from pathtrace_tpu.ops import bvh_intersect as bv

    rng = np.random.default_rng(12)
    T, N = 1800, 1024
    v0 = jnp.asarray(rng.uniform(-5, 5, (T, 3)), jnp.float32)
    e1 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    e2 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
    mat = jnp.asarray(rng.integers(0, 5, (T,)), jnp.int32)
    o = jnp.asarray(rng.uniform(-6, 6, (N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    args = (o, d, 1e-3, jnp.inf, v0, e1, e2, nrm, mat)
    ref = bv.triangle_closest_bvh(*args, interpret=True)
    got = bv.triangle_closest_bvh(*args, interpret=True, mxu=True)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    hit = np.asarray(ref[1]) >= 0
    np.testing.assert_allclose(
        np.asarray(ref[0])[hit], np.asarray(got[0])[hit], rtol=2e-4
    )
    # Winner payloads come from the same table rows — exactly equal.
    np.testing.assert_array_equal(
        np.asarray(ref[2])[hit], np.asarray(got[2])[hit]
    )
    np.testing.assert_array_equal(
        np.asarray(ref[3])[hit], np.asarray(got[3])[hit]
    )
    occ_ref = bv.triangle_anyhit_bvh(o, d, 1e-3, 8.0, v0, e1, e2,
                                     interpret=True)
    occ = bv.triangle_anyhit_bvh(o, d, 1e-3, 8.0, v0, e1, e2,
                                 interpret=True, mxu=True)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ))

    # Streamed coefficient transport == resident, bitwise. (mt_stream is a
    # STATIC arg — monkeypatching VMEM_TABLE_BUDGET would silently hit the
    # jit cache and compare the resident executable against itself.)
    got_s = bv.triangle_closest_bvh(*args, interpret=True, mxu=True,
                                    mt_stream=True)
    occ_s = bv.triangle_anyhit_bvh(o, d, 1e-3, 8.0, v0, e1, e2,
                                   interpret=True, mxu=True, mt_stream=True)
    for a, b in zip(got, got_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_s))


@pytest.mark.slow
def test_bvh_rows_layout_matches_cols():
    """The rows-layout streamed BVH ((T,16) table, no in-kernel transpose)
    must be bitwise-identical to the lane-transposed form."""
    import jax
    import numpy as np

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.ops import bvh_intersect as bv

    scene = scenes.mesh_scene(n_tris=2000)
    key = jax.random.PRNGKey(7)
    n = 1024
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    args = (o, d, 1e-3, jnp.inf, scene.tri_v0, scene.tri_e1, scene.tri_e2,
            scene.tri_normal, scene.tri_mat)
    a = bv.triangle_closest_bvh(*args, interpret=True, stream=False)
    b = bv.triangle_closest_bvh(*args, interpret=True, layout="rows")
    for x, y, name in zip(a, b, ("t", "idx", "normal", "mat")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
    oa = bv.triangle_anyhit_bvh(o, d, 1e-3, 2.5, scene.tri_v0, scene.tri_e1,
                                scene.tri_e2, interpret=True, stream=False)
    ob = bv.triangle_anyhit_bvh(o, d, 1e-3, 2.5, scene.tri_v0, scene.tri_e1,
                                scene.tri_e2, interpret=True, layout="rows")
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


@pytest.mark.slow
def test_bvh_param_knobs_are_bitwise_equal():
    """PT_BVH_SUBW/GROUP/PRIM_TILE (trace-time tuning knobs threaded through
    intersect() via bvh_intersect.env_params) must not change results: the
    union sweep visits different node granularities in a different order but
    the per-lane winner math is identical."""
    import jax
    import numpy as np

    from pathtrace_tpu.ops import bvh_intersect as bv

    rng = np.random.default_rng(4)
    T, N = 2000, 1024
    v0 = jnp.asarray(rng.uniform(-5, 5, (T, 3)), jnp.float32)
    e1 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    e2 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
    mat = jnp.asarray(rng.integers(0, 5, (T,)), jnp.int32)
    o = jnp.asarray(rng.uniform(-6, 6, (N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    ref = bv.triangle_closest_bvh(o, d, 1e-3, jnp.inf, v0, e1, e2, nrm, mat,
                                  interpret=True)
    occ_ref = bv.triangle_anyhit_bvh(o, d, 1e-3, 8.0, v0, e1, e2,
                                     interpret=True)
    for kw in ({"sub_w": 128}, {"group": 8}, {"prim_tile": 256},
               {"sub_w": 512, "group": 32}, {"lane_gate": 256},
               {"lane_gate": 0}):
        got = bv.triangle_closest_bvh(o, d, 1e-3, jnp.inf, v0, e1, e2, nrm,
                                      mat, interpret=True, **kw)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        occ = bv.triangle_anyhit_bvh(o, d, 1e-3, 8.0, v0, e1, e2,
                                     interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ))


@pytest.mark.slow
def test_bvh_counters_diagnostics():
    """counters=True returns per-subtile (rounds, leaf sweeps) without
    changing the hit results."""
    import jax
    import numpy as np

    from pathtrace_tpu.ops import bvh_intersect as bv

    rng = np.random.default_rng(5)
    T, N = 1500, 1024
    v0 = jnp.asarray(rng.uniform(-5, 5, (T, 3)), jnp.float32)
    e1 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    e2 = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 3)), jnp.float32)
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
    mat = jnp.zeros((T,), jnp.int32)
    o = jnp.asarray(rng.uniform(-6, 6, (N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    ref = bv.triangle_closest_bvh(o, d, 1e-3, jnp.inf, v0, e1, e2, nrm, mat,
                                  interpret=True)
    got = bv.triangle_closest_bvh(o, d, 1e-3, jnp.inf, v0, e1, e2, nrm, mat,
                                  interpret=True, counters=True)
    assert len(got) == 6
    for a, b in zip(ref, got[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rounds, sweeps = np.asarray(got[4]), np.asarray(got[5])
    assert rounds.shape == (N // 256,) and sweeps.shape == (N // 256,)
    assert rounds.sum() > 0 and (sweeps >= rounds).all()
