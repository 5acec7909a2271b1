"""Per-component timing of one pool iteration's kernels on the bench scene.

Times each Pallas kernel and the XLA glue separately at production wave size
so optimization work targets the real bottleneck. Every timed call uses distinct
inputs (tunnel elides identical dispatches) and ends with a forced host
transfer (CLAUDE.md benchmark hygiene).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import intersect as isect
from pathtrace_tpu.ops import pallas_intersect as pk

N = 16384
REPS = 200


def timeit(name, fn, inputs):
    """Time fn amortized inside one dispatch: a lax.scan of REPS iterations
    with per-iteration perturbed inputs (kills dispatch overhead AND the
    tunnel's identical-dispatch elision)."""
    def step(carry, i):
        o, d, a, b = inputs[0]
        o = o + carry * 1e-6  # data-dependent perturbation, no two iters equal
        r = fn(o, d, a, b)
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None

    run = jax.jit(
        lambda n: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0],
        static_argnums=0,
    )
    float(run(2))   # compile+warm the short variant
    float(run(REPS))  # compile+warm the long variant
    t0 = time.perf_counter()
    float(run(2))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(run(REPS))
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (REPS - 2)
    print(f"{name:34s} {dt*1e3:8.3f} ms/iter  (sink {v:.3g})")
    return dt


def main():
    scene = scenes.many_spheres()
    cam = scenes.many_spheres_camera(256, 256)
    key = jax.random.PRNGKey(0)

    def rays(k):
        o = jax.random.uniform(k, (N, 3), jnp.float32, -3.0, 3.0)
        d = jax.random.normal(jax.random.fold_in(k, 1), (N, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        return o, d

    ins = []
    for i in range(4):
        o, d = rays(jax.random.fold_in(key, i))
        tmin = jnp.full((N,), 1e-3, jnp.float32)
        tmax = jnp.full((N,), jnp.inf, jnp.float32)
        ins.append((o, d, tmin, tmax))
    jax.block_until_ready(ins)

    nt = scene.tri_v0.shape[0]
    ns = scene.sph_center.shape[0]
    print(f"scene: {nt} tris, {ns} spheres; wave = {N}")

    sph = jax.jit(lambda o, d, a, b: pk.sphere_closest(
        o, d, a, b, scene.sph_center, scene.sph_radius, scene.sph_mat,
        cluster_min=scene.sph_cluster_min, cluster_max=scene.sph_cluster_max))
    tri = jax.jit(lambda o, d, a, b: pk.triangle_closest(
        o, d, a, b, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        scene.tri_normal, scene.tri_mat,
        prim_tile=isect._round_tile(nt, 8) if nt <= 64 else 256))
    anyh = jax.jit(lambda o, d, a, b: isect.occluded(scene, o, d, a, b))
    full = jax.jit(lambda o, d, a, b: isect.intersect(scene, o, d, a, b).t)

    timeit("sphere_closest", sph, ins)
    timeit("triangle_closest", tri, ins)
    timeit("any_hit (occluded)", anyh, ins)
    timeit("intersect (tri+sph+merge)", full, ins)


if __name__ == "__main__":
    main()


def variants():
    scene = scenes.many_spheres()
    key = jax.random.PRNGKey(7)
    ins = []
    for i in range(2):
        k = jax.random.fold_in(key, i)
        o = jax.random.uniform(k, (N, 3), jnp.float32, -3.0, 3.0)
        d = jax.random.normal(jax.random.fold_in(k, 1), (N, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        tmin = jnp.full((N,), 1e-3, jnp.float32)
        tmax = jnp.full((N,), jnp.inf, jnp.float32)
        ins.append((o, d, tmin, tmax))
    jax.block_until_ready(ins)

    # A: single 512-row sphere tile, no traversal machinery
    sphA = jax.jit(lambda o, d, a, b: pk.sphere_closest(
        o, d, a, b, scene.sph_center, scene.sph_radius, scene.sph_mat,
        prim_tile=512))
    # B: current two 256-row clusters + front-to-back
    sphB = jax.jit(lambda o, d, a, b: pk.sphere_closest(
        o, d, a, b, scene.sph_center, scene.sph_radius, scene.sph_mat,
        cluster_min=scene.sph_cluster_min, cluster_max=scene.sph_cluster_max))
    # C: any_hit with 1024-lane ray tiles
    anyC = jax.jit(lambda o, d, a, b: pk.any_hit(
        o, d, a, b, scene.sph_center, scene.sph_radius,
        scene.tri_v0, scene.tri_e1, scene.tri_e2,
        sph_cluster=(scene.sph_cluster_min, scene.sph_cluster_max),
        ray_tile=1024))
    # D: any_hit current (512 lanes)
    anyD = jax.jit(lambda o, d, a, b: pk.any_hit(
        o, d, a, b, scene.sph_center, scene.sph_radius,
        scene.tri_v0, scene.tri_e1, scene.tri_e2,
        sph_cluster=(scene.sph_cluster_min, scene.sph_cluster_max),
        ray_tile=512))
    # E: any_hit single 512-row sphere tile, 1024 lanes
    anyE = jax.jit(lambda o, d, a, b: pk.any_hit(
        o, d, a, b, scene.sph_center, scene.sph_radius,
        scene.tri_v0, scene.tri_e1, scene.tri_e2,
        prim_tile=512, ray_tile=1024))

    timeit("sphere 1x512 no-traversal", sphA, ins)
    timeit("sphere 2x256 front-to-back", sphB, ins)
    timeit("any_hit 1024 lanes", anyC, ins)
    timeit("any_hit 512 lanes (current)", anyD, ins)
    timeit("any_hit 1x512 prim, 1024 lanes", anyE, ins)
