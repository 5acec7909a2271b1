"""Bounce-megakernel equivalence: the fused path (ops/pallas_shade.py, run in
Pallas interpret mode on CPU) must reproduce the composed per-op pool path.

Two levels of strictness, because near-delta GGX is f32-chaotic: at
roughness 0.02 the D term's denominator ``α²c² + sin²θ`` sits at f32-epsilon
scale, so a 1-ulp half-vector difference between two correct evaluation
orders legitimately moves single-sample values by percents. Therefore:

* Discrete path structure (every RR decision, Fresnel coin, light pick,
  termination — summarized by the exact traced-ray counter) must match
  EXACTLY on every scene.
* Radiance matches tightly on scenes whose roughest lobe is ≥ 0.3 (no
  f32-chaotic lobes), loosely on the bench scenes with 0.02-rough glass.
"""

import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.models.materials import Emissive, Lambertian, Mirror
from pathtrace_tpu.models.scene import SceneBuilder
from pathtrace_tpu.models.camera import Camera
from pathtrace_tpu.ops import pallas_shade
from pathtrace_tpu.ops.intersect import set_default_method
from pathtrace_tpu.pool import ray_count, render_pool

W = H = 12
SPP = 2


def _rough_scene():
    """Every lobe ≥ 0.3 roughness: fused/composed agreement is rounding-level."""
    b = SceneBuilder()
    b.add_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20),
               Lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0.0, 1.0, -3.0), 1.0, Lambertian((0.7, 0.3, 0.3)))
    b.add_sphere((-2.2, 1.0, -3.0), 1.0, Mirror(roughness=0.4, metallic=1.0))
    b.add_sphere((2.2, 1.0, -3.0), 1.0, Mirror(roughness=0.35, metallic=0.0, ior=1.5))
    b.add_sphere((0.0, 6.0, -3.0), 1.5, Emissive((12.0, 12.0, 12.0)))
    # A triangle light too, so both light-sampling lanes run.
    b.add_triangle((-3.0, 5.0, -1.0), (-1.0, 5.0, -1.0), (-2.0, 5.0, -2.0),
                   Emissive((8.0, 8.0, 8.0)))
    return b.build()


def _render_pair(sc, cam, integrator, **kw):
    set_default_method(None)  # CPU default: composed per-op path
    a = render_pool(sc, cam, width=W, height=H, spp=SPP,
                    integrator=integrator, **kw)
    set_default_method("pallas_interpret")  # fused megakernel, interpreted
    try:
        b = render_pool(sc, cam, width=W, height=H, spp=SPP,
                        integrator=integrator, **kw)
    finally:
        set_default_method(None)
    return a, b


@pytest.mark.parametrize("integrator", ["mis", "nee", "brdf_only"])
def test_fused_matches_composed_rough(integrator):
    sc = _rough_scene()
    cam = Camera.look_at((0.0, 2.0, 4.0), (0.0, 1.0, -3.0), (0.0, 1.0, 0.0),
                         W, H, 55.0)
    (ia, ra, _), (ib, rb, _) = _render_pair(
        sc, cam, integrator, max_bounces=6, num_slots=64, seed=7
    )
    assert ray_count(ra) == ray_count(rb)  # identical discrete path structure
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "scene_name,integrator",
    [("cornell", "mis"), ("cornell", "nee"), ("cornell", "brdf_only"),
     ("many", "mis")],
)
def test_fused_matches_composed_bench_scenes(scene_name, integrator):
    if scene_name == "cornell":
        sc, cam = scenes.cornell_box(), scenes.cornell_camera(W, H)
    else:
        sc, cam = scenes.many_spheres(n_per_side=3), scenes.many_spheres_camera(W, H)
    (ia, ra, _), (ib, rb, _) = _render_pair(
        sc, cam, integrator, max_bounces=6, num_slots=64, seed=5
    )
    assert ray_count(ra) == ray_count(rb)
    # 0.02-roughness glass lobes are f32-chaotic (see module docstring; the
    # f64 test below shows the estimators agree to ~1e-13): bound the bulk
    # tightly, allow isolated specular-chain outliers, pin the mean.
    a, b = np.asarray(ia), np.asarray(ib)
    err = np.abs(a - b) / np.maximum(np.abs(a), 1.0)
    assert np.quantile(err, 0.99) <= 5e-2
    assert (err > 5e-2).mean() <= 0.02
    # (No mean bound: at 12x12x2spp a single chaotic specular sample moves
    # the image mean by ~0.02 — the f64 test below is the estimator check.)


def test_fused_matches_composed_f64_exact():
    """The discriminator between 'estimator bug' and 'f32 conditioning': in
    f64 the near-delta GGX terms are far above epsilon, so the fused kernel
    must agree with the composed path to rounding level (~1e-12) on the very
    scene whose f32 renders show percent-level specular-chain outliers.
    Subprocess because x64 is process-global."""
    import json
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import numpy as np
import jax.numpy as jnp
from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops.intersect import set_default_method
from pathtrace_tpu.pool import render_pool, ray_count
W = H = 12
conv = lambda t: jax.tree_util.tree_map(
    lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
sc = conv(scenes.many_spheres(n_per_side=3))
cam = conv(scenes.many_spheres_camera(W, H))
set_default_method(None)
a, ra, _ = render_pool(sc, cam, width=W, height=H, spp=2, integrator="mis",
                       max_bounces=6, num_slots=64, seed=5)
set_default_method("pallas_interpret")
b, rb, _ = render_pool(sc, cam, width=W, height=H, spp=2, integrator="mis",
                       max_bounces=6, num_slots=64, seed=5)
a, b = np.asarray(a), np.asarray(b)
rel = float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1.0)))
print(json.dumps({"max_rel": rel, "rays_eq": ray_count(ra) == ray_count(rb)}))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rays_eq"]
    assert res["max_rel"] <= 1e-9, res


def test_fused_output_vma_interface():
    """The megakernel's output avals must union the varying mesh axes of its
    ray inputs — the contract that lets the real-TPU lowering (opaque kernel
    call) type-check under shard_map. Interpreted kernels cannot run under
    the vma checker itself (the interpreter evaluates the body op-by-op and
    mixed invariant/varying interior ops trip it — a JAX limitation, not a
    lowering bug), so this asserts the interface directly on the traced
    avals; the end-to-end sharded-fused path is exercised on real hardware
    (docs/PERFORMANCE.md round-3 notes)."""
    import jax
    import jax.numpy as jnp

    sc = scenes.cornell_box()
    tables = pallas_shade.build_tables(sc)
    n = 16

    def probe(o, d):
        busy = jnp.ones((n,), jnp.int32) != 0
        bounce = jnp.zeros((n,), jnp.int32)
        res = pallas_shade.fused_bounce(
            tables, busy, bounce, o, d,
            jnp.ones((n,)), jnp.ones((n,)), jnp.ones((n, 3)),
            jnp.full((n, 8), 0.5),
            num_tris=sc.tri_v0.shape[0], num_lights=sc.num_lights,
            integrator="mis", max_bounces=4, interpret=True, ray_tile=128,
        )
        return res

    o = jnp.zeros((n, 3))
    d = jnp.concatenate([jnp.zeros((n, 2)), -jnp.ones((n, 1))], axis=1)
    shapes = jax.eval_shape(probe, o, d)
    # Single-device trace: outputs exist with the right shapes/dtypes.
    assert shapes.rad_delta.shape == (n, 3)
    assert shapes.live.dtype == jnp.bool_


def test_fused_gate_excludes_unsupported():
    # Big scenes must fall back to the composed path; ON/PBR scenes ride the
    # megakernel's statically-gated lanes since round 4.
    from pathtrace_tpu.models.materials import OrenNayar

    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, -3.0), 1.0, OrenNayar((0.5, 0.5, 0.5), 0.3))
    b.add_sphere((0.0, 3.0, -3.0), 0.5, Emissive((5.0, 5.0, 5.0)))
    sc = b.build()
    assert pallas_shade.supports_scene(sc, "mis")
    assert pallas_shade.supports_scene(scenes.cornell_box(), "mis")
    assert pallas_shade.supports_scene(scenes.many_spheres(), "mis")
    assert not pallas_shade.supports_scene(scenes.mesh_scene(2000), "mis")


def _on_pbr_scene():
    """Oren–Nayar + PBR + Lambert + a mirror, all lobes ≥ 0.3 roughness so
    fused/composed agreement is rounding-level (module docstring)."""
    from pathtrace_tpu.models.materials import OrenNayar, PBRMaterial

    b = SceneBuilder()
    b.add_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20),
               OrenNayar((0.6, 0.55, 0.5), 0.5))
    b.add_sphere((0.0, 1.0, -3.0), 1.0, PBRMaterial((0.7, 0.3, 0.3),
                                                    roughness=0.4,
                                                    metallic=0.0))
    b.add_sphere((-2.2, 1.0, -3.0), 1.0, PBRMaterial((0.9, 0.8, 0.4),
                                                     roughness=0.35,
                                                     metallic=1.0))
    b.add_sphere((2.2, 1.0, -3.0), 1.0, Mirror(roughness=0.4, metallic=1.0))
    b.add_sphere((4.0, 1.0, -5.0), 1.0, Lambertian((0.3, 0.5, 0.7)))
    b.add_sphere((0.0, 6.0, -3.0), 1.5, Emissive((12.0, 12.0, 12.0)))
    b.add_triangle((-3.0, 5.0, -1.0), (-1.0, 5.0, -1.0), (-2.0, 5.0, -2.0),
                   Emissive((8.0, 8.0, 8.0)))
    return b.build()


@pytest.mark.parametrize("integrator", ["mis", "brdf_only"])
def test_fused_matches_composed_on_pbr(integrator):
    """The round-4 ON/PBR megakernel lanes must reproduce the composed
    path's estimator: identical discrete path structure (exact traced-ray
    counter), rounding-level radiance (all lobes ≥ 0.3 roughness)."""
    sc = _on_pbr_scene()
    assert sc.has_oren_nayar and sc.has_pbr
    assert pallas_shade.supports_scene(sc, integrator)
    cam = Camera.look_at((0.0, 2.0, 4.0), (0.0, 1.0, -3.0), (0.0, 1.0, 0.0),
                         W, H, 55.0)
    (ia, ra, _), (ib, rb, _) = _render_pair(
        sc, cam, integrator, max_bounces=6, num_slots=64, seed=3
    )
    assert ray_count(ra) == ray_count(rb)  # identical discrete path structure
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-3, atol=1e-3)


def test_sphere_quad_table_matches_direct():
    """The MXU quadratic-form sphere tables (pallas_shade._sphere_quad_tables)
    must reproduce disc and half_b from the direct half-b formulas: bf16-split
    products are exact, cluster-local recentering bounds the f32 accumulation
    error, and self-hit pairs (ray origin ON a sphere of the block) must stay
    far below the eps=1e-3 guard."""
    import jax
    import jax.numpy as jnp

    sc = scenes.many_spheres()
    tables = pallas_shade.build_tables(sc)
    assert tables.quad is not None
    CB = pallas_shade._QUAD_CB
    key = jax.random.PRNGKey(3)
    n = 256
    # Origins across the WHOLE scene (the round-3 global-coordinate bug only
    # appeared at scene-corner |o|^2 magnitudes), directions random.
    o = jax.random.uniform(key, (n, 3), minval=-60.0, maxval=60.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    ox, oy, oz = o[:, 0:1].T, o[:, 1:2].T, o[:, 2:3].T
    dx, dy, dz = d[:, 0:1].T, d[:, 1:2].T, d[:, 2:3].T

    # Kernel-side per-block evaluation (mirrors _fused_bounce_kernel).
    n_blocks = tables.quad.shape[0] // (2 * CB)
    zpad = jnp.zeros(
        (pallas_shade._QUAD_K - 6 * pallas_shade._QUAD_FEATS, n), jnp.float32
    )
    one = jnp.ones_like(ox)
    disc_b, hb_b = [], []
    for c in range(n_blocks):
        gx, gy, gz = (tables.quadg[c, k] for k in range(3))
        oxc, oyc, ozc = ox - gx, oy - gy, oz - gz
        odc = oxc * dx + oyc * dy + ozc * dz
        ooc = oxc * oxc + oyc * oyc + ozc * ozc
        phi = jnp.concatenate([
            dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz,
            odc * dx, odc * dy, odc * dz, oxc, oyc, ozc,
            odc * odc - ooc, one, dx, dy, dz,
        ], axis=0)
        p0, p1, p2 = pallas_shade._bf16_split3(phi)
        phi_ext = jnp.concatenate([p0, p1, p2, p0, p1, p0, zpad], axis=0)
        pairs = tables.quad[c * 2 * CB:(c + 1) * 2 * CB].astype(jnp.float32) @ phi_ext
        disc_b.append(pairs[:CB])
        hb_b.append(odc - pairs[CB:])
    sph = tables.sph
    P = sph.shape[0]
    disc_mxu = jnp.concatenate(disc_b, axis=0)[:P]
    hb_mxu = jnp.concatenate(hb_b, axis=0)[:P]

    # Direct formulas against the same padded table.
    c = sph[:, :3]
    kq = sph[:, 3]
    cd = c @ d.T
    co = c @ o.T
    od = (ox * dx + oy * dy + oz * dz)[0]
    oo = (ox * ox + oy * oy + oz * oz)[0]
    half_b = od[None, :] - cd
    disc = half_b * half_b - (oo[None, :] - 2.0 * co + kq[:, None])

    real = ~np.isnan(np.asarray(kq))
    scale = np.maximum(np.abs(np.asarray(disc[real])), 1.0)
    np.testing.assert_allclose(
        np.asarray(disc_mxu[real]) / scale, np.asarray(disc[real]) / scale,
        atol=5e-3, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(hb_mxu[real]), np.asarray(half_b[real]), atol=1e-3, rtol=1e-5
    )

    # Self-hit guard: origins ON each sphere's surface, outward directions.
    # The spurious root2 ~ |disc error| / (2 |half_b|) must stay << eps.
    cs = np.asarray(sc.sph_center)
    rs = np.asarray(sc.sph_radius)
    nn = np.random.default_rng(0).normal(size=cs.shape)
    nn /= np.linalg.norm(nn, axis=1, keepdims=True)
    os_ = cs + rs[:, None] * nn
    ds_ = nn  # leaving the surface
    oxs = jnp.asarray(os_[:, 0:1].T); oys = jnp.asarray(os_[:, 1:2].T)
    ozs = jnp.asarray(os_[:, 2:3].T)
    dxs = jnp.asarray(ds_[:, 0:1].T); dys = jnp.asarray(ds_[:, 1:2].T)
    dzs = jnp.asarray(ds_[:, 2:3].T)
    ns = cs.shape[0]
    zpad_s = jnp.zeros(
        (pallas_shade._QUAD_K - 6 * pallas_shade._QUAD_FEATS, ns), jnp.float32
    )
    ones = jnp.ones_like(oxs)
    worst = 0.0
    for c in range(n_blocks):
        gx, gy, gz = (tables.quadg[c, k] for k in range(3))
        oxc, oyc, ozc = oxs - gx, oys - gy, ozs - gz
        odc = oxc * dxs + oyc * dys + ozc * dzs
        ooc = oxc * oxc + oyc * oyc + ozc * ozc
        phi = jnp.concatenate([
            dxs * dxs, dys * dys, dzs * dzs, dxs * dys, dxs * dzs, dys * dzs,
            odc * dxs, odc * dys, odc * dzs, oxc, oyc, ozc,
            odc * odc - ooc, ones, dxs, dys, dzs,
        ], axis=0)
        p0, p1, p2 = pallas_shade._bf16_split3(phi)
        phi_ext = jnp.concatenate([p0, p1, p2, p0, p1, p0, zpad_s], axis=0)
        pairs = tables.quad[c * 2 * CB:(c + 1) * 2 * CB].astype(jnp.float32) @ phi_ext
        # Diagonal = each ray against ITS OWN sphere (ray j spawned on
        # sphere c*CB + j within this block).
        lo, hi = c * CB, min((c + 1) * CB, ns)
        if lo >= ns:
            break
        dd = np.asarray(pairs[:CB])
        hb = np.asarray(odc - pairs[CB:])
        for j in range(hi - lo):
            ray = lo + j
            # True disc here is exactly half_b^2 (origin on the surface), so
            # the spurious root2 magnitude is ~ |disc_err| / (2 |half_b|).
            h = hb[j, ray]
            err = abs(dd[j, ray] - h * h)
            worst = max(worst, err / max(2.0 * abs(h), 1e-3))
    # Scales ~ block-radius^2: ~1e-4 at 64-sphere blocks, ~2.5e-4 at the
    # production 128-sphere blocks — keep at least 2.5x margin under the
    # eps=1e-3 guard (the VPU chain's own corner-of-scene margin is ~4x).
    assert worst < 4e-4, worst


def test_quad_anyhit_matches_f64_oracle():
    """pallas_shade.any_hit_quad (MXU quad-table shadow sweep, interpret
    mode) must agree with an f64 numpy occlusion oracle on every lane whose
    decision is robust — i.e. further than the quad sweep's documented
    ~1e-3 disc error from every branch threshold. Knife-edge lanes (tangent
    rays, range-boundary roots) are excluded by construction: they are the
    documented determinism-contract rounding freedom."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    ns = 200
    centers = rng.uniform(-30, 30, (ns, 3))
    radii = rng.uniform(0.4, 2.5, ns)
    b = SceneBuilder()
    for c, r in zip(centers, radii):
        b.add_sphere(tuple(c), float(r), Lambertian((0.5, 0.5, 0.5)))
    # One real quad (two triangles) so the kernel's MT lane sees real hits.
    b.add_quad((-40, -35, -40), (40, -35, -40), (40, -35, 40), (-40, -35, 40),
               Lambertian((0.5, 0.5, 0.5)))
    sc = b.build()
    tables = pallas_shade.build_tables(sc)
    assert tables.quad is not None

    n = 512
    o = rng.uniform(-40, 40, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = rng.uniform(0.1, 80.0, n)
    t_max[:17] = -1.0          # the pool's no-NEE sentinel: never occluded
    eps = 1e-3

    import os

    def run_quad():
        return np.asarray(pallas_shade.any_hit_quad(
            tables,
            jnp.asarray(o.T, jnp.float32),
            jnp.asarray(d.T, jnp.float32),
            jnp.asarray(t_max, jnp.float32),
            eps=eps, interpret=True, ray_tile=256,
        ))

    got = run_quad()
    # The sqrt-free interval formulation (PT_ANYHIT_INTERVAL=1) must obey
    # the same oracle on the same robust lanes.
    os.environ["PT_ANYHIT_INTERVAL"] = "1"
    jax.clear_caches()
    try:
        got_interval = run_quad()
    finally:
        del os.environ["PT_ANYHIT_INTERVAL"]
        jax.clear_caches()

    # f64 oracle with per-primitive decision margins.
    delta = 2e-2
    occ = np.zeros(n, bool)
    conf = np.ones(n, bool)
    robust_hit = np.zeros(n, bool)
    for ci, rr in zip(centers, radii):
        oc = o - ci
        hb = np.einsum("ij,ij->i", oc, d)
        disc = hb * hb - (np.einsum("ij,ij->i", oc, oc) - rr * rr)
        sq = np.sqrt(np.maximum(disc, 0.0))
        r1, r2 = -hb - sq, -hb + sq
        t_c = np.where(r1 >= eps, r1, r2)
        ok = (disc > 0) & (t_c >= eps) & (t_c <= t_max)
        occ |= ok
        range_margin = np.minimum.reduce(
            [np.abs(r1 - eps), np.abs(r1 - t_max),
             np.abs(r2 - eps), np.abs(r2 - t_max)])
        # A pair's decision is robust if the ray robustly misses the sphere
        # (disc well below 0 — root-range margins are then irrelevant) or
        # the roots are real with clearance AND sit far from every range
        # boundary / root-selection threshold. The quad sweep's measured
        # disc error is <= 5e-3 * max(|disc|, 1) (see
        # test_sphere_quad_table_matches_direct), so an absolute band of
        # 0.2 on disc gives a 20x sign margin, and with disc > 0.2 the
        # root error is <= ~7e-3 < delta (disc <= r^2 <= 6.25 here, so
        # sqrt(disc) is never large).
        robust_pair = (disc < -0.2) | ((disc > 0.2) & (range_margin > delta))
        robust_hit |= ok & robust_pair
        conf &= robust_pair
    # Triangles (Moller-Trumbore, same margins).
    tv0 = np.asarray(sc.tri_v0, np.float64)
    te1 = np.asarray(sc.tri_e1, np.float64)
    te2 = np.asarray(sc.tri_e2, np.float64)
    for v0, e1, e2 in zip(tv0, te1, te2):
        if not np.any(e1) and not np.any(e2):
            continue
        h = np.cross(d, e2)
        a = h @ e1
        f = 1.0 / np.where(np.abs(a) < 1e-300, 1e-300, a)
        s = o - v0
        u = f * np.einsum("ij,ij->i", s, h)
        q = np.cross(s, e1)
        v = f * np.einsum("ij,ij->i", q, d)
        t = f * (q @ e2)
        ok = ((np.abs(a) >= 1e-8) & (u >= 0) & (u <= 1) & (v >= 0)
              & (u + v <= 1) & (t >= eps) & (t <= t_max))
        occ |= ok
        margin = np.minimum.reduce([
            np.abs(u), np.abs(1.0 - u), np.abs(v), np.abs(1.0 - u - v),
            np.abs(t - eps), np.abs(t - t_max),
        ])
        robust_pair = (margin > delta) & (np.abs(a) > 1e-6)
        robust_hit |= ok & robust_pair
        conf &= robust_pair
    confident = conf | robust_hit
    assert confident.mean() > 0.8   # the filter must not trivialize the test
    np.testing.assert_array_equal(got[confident], occ[confident])
    assert not got[:17].any()       # sentinel lanes never occlude
    np.testing.assert_array_equal(got_interval[confident], occ[confident])
    assert not got_interval[:17].any()


def test_pool_quad_shadow_matches_vpu_path():
    """End-to-end: the production pool with the full MXU quad family forced
    on under the interpreter (megakernel quadratic sweep + quad any-hit
    shadow) must reproduce the VPU fused path up to the documented
    knife-edge budget (tests/imgutil.py)."""
    import os

    import jax

    from tests.imgutil import assert_images_match

    sc = scenes.many_spheres(n_per_side=3)
    cam = scenes.many_spheres_camera(W, H)
    set_default_method("pallas_interpret")
    try:
        a, ra, _ = render_pool(sc, cam, width=W, height=H, spp=SPP,
                               integrator="mis", max_bounces=6, num_slots=64,
                               seed=5)
        os.environ["PT_FORCE_MXU_QUAD"] = "1"
        jax.clear_caches()   # env is read at trace time
        try:
            b, rb, _ = render_pool(sc, cam, width=W, height=H, spp=SPP,
                                   integrator="mis", max_bounces=6,
                                   num_slots=64, seed=5)
        finally:
            del os.environ["PT_FORCE_MXU_QUAD"]
            jax.clear_caches()
    finally:
        set_default_method(None)
    # Path structure is allowed to differ only on knife-edge samples; at
    # this size that is exact in practice, but the contract is the image
    # budget, not the ray counter.
    assert_images_match(np.asarray(a), np.asarray(b), max_outliers=3)
