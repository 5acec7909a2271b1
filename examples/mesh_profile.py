"""Mesh-scene (BASELINE config 4) kernel breakdown on realistic ray mixes.

The 70k-triangle scene is the biggest perf gap (docs/PERFORMANCE.md). This
times the triangle closest-hit and fused any-hit kernels on primary-like
(coherent) and bounce-like (incoherent) waves, sorted and unsorted, so the
cluster-culling levers (ray sorting, miss-bit grouping, early-out) can be
evaluated in isolation from the pool loop.
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

N = 65536
REPS = 20


def timeit(name, fn, inputs):
    def step(carry, i):
        o, d, a, b = inputs
        o = o + carry * 1e-6
        r = fn(o, d, a, b)
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None

    run = jax.jit(lambda n: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0],
                  static_argnums=0)
    float(run(2)); float(run(REPS))
    t0 = time.perf_counter(); float(run(2)); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(run(REPS)); tl = time.perf_counter() - t0
    dt = (tl - ts) / (REPS - 2)
    print(f"{name:46s} {dt*1e3:9.3f} ms/call  (sink {v:.3g})")
    return dt


def main():
    scene = scenes.mesh_scene()
    cam = scenes.mesh_scene_camera(1920, 1080)
    key = jax.random.PRNGKey(0)

    # Primary-like rays: jittered camera rays of a coherent pixel block.
    px = jnp.arange(N, dtype=jnp.int32) % 1920
    py = (jnp.arange(N, dtype=jnp.int32) // 1920) + 400
    jit2 = jax.random.uniform(key, (N, 2))
    o_p, d_p = cam.generate_rays(px, py, jit2)

    # Bounce-like rays: origins on the mesh AABB interior, random directions.
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o_b = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * (hi - lo) + lo
    d_b = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)

    tmin = jnp.full((N,), 1e-3, jnp.float32)
    tmax = jnp.full((N,), jnp.inf, jnp.float32)

    tri = jax.jit(lambda o, d, a, b: pk.triangle_closest(
        o, d, a, b, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        scene.tri_normal, scene.tri_mat,
        cluster_min=scene.tri_cluster_min, cluster_max=scene.tri_cluster_max))
    full = jax.jit(lambda o, d, a, b: isect.intersect(scene, o, d, a, b).t)
    occ = jax.jit(lambda o, d, a, b: isect.occluded(scene, o, d, a, b))

    def presort(o, d):
        k = isect._ray_sort_key(scene, o, d, tmin, tmax)
        out = isect._sort_rays_by_key(k, o, d, tmin, tmax)
        return out[0], out[1]

    o_ps, d_ps = presort(o_p, d_p)
    o_bs, d_bs = presort(o_b, d_b)
    jax.block_until_ready((o_ps, o_bs))

    timeit("tri_closest primary unsorted", tri, (o_p, d_p, tmin, tmax))
    timeit("tri_closest primary pre-sorted", tri, (o_ps, d_ps, tmin, tmax))
    timeit("tri_closest bounce unsorted", tri, (o_b, d_b, tmin, tmax))
    timeit("tri_closest bounce pre-sorted", tri, (o_bs, d_bs, tmin, tmax))
    timeit("intersect() bounce (sort+both+merge)", full, (o_b, d_b, tmin, tmax))
    timeit("occluded() bounce (sort+anyhit)", occ, (o_b, d_b, tmin, tmax))


if __name__ == "__main__":
    main()
