"""Does ray coherence + finer clusters speed the sphere kernels?

Hypothesis (docs/PERFORMANCE.md next-step 1): cluster AABB culling only fires
when a kernel ray-tile is spatially coherent. Bounce rays are not; sorting the
wave by (direction octant, origin block) should let finer clusters cut the
brute-force 488-sphere sweep. This measures the kernels on the SAME ray
population unsorted vs key-sorted, at 256- and 64-row cluster sizes.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models import scenes
from pathtrace_tpu.models.scene import _cluster_aabbs
from pathtrace_tpu.ops import pallas_intersect as pk
from pathtrace_tpu.ops.intersect import _ray_sort_key

N = 16384
REPS = 200


def timeit(name, fn, inputs):
    def step(carry, i):
        o, d, a, b = inputs
        o = o + carry * 1e-6
        r = fn(o, d, a, b)
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None

    run = jax.jit(
        lambda n: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0],
        static_argnums=0,
    )
    float(run(2)); float(run(REPS))
    t0 = time.perf_counter(); float(run(2)); t_short = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(run(REPS)); t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (REPS - 2)
    print(f"{name:44s} {dt*1e3:8.3f} ms/iter  (sink {v:.3g})")
    return dt


def bounce_like_rays(scene, key):
    """Rays distributed like bounce rays: origins on sphere surfaces,
    cosine-ish directions — the hard (incoherent) case."""
    k1, k2, k3 = jax.random.split(key, 3)
    ns = scene.sph_center.shape[0]
    pick = jax.random.randint(k1, (N,), 0, ns)
    c = scene.sph_center[pick]
    r = scene.sph_radius[pick]
    nrm = jax.random.normal(k2, (N, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
    o = c + nrm * (r[:, None] * 1.001)
    d = jax.random.normal(k3, (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.where(jnp.sum(d * nrm, axis=1, keepdims=True) < 0, -d, d)
    return o, d


def main():
    scene = scenes.many_spheres()
    key = jax.random.PRNGKey(3)
    o, d = bounce_like_rays(scene, key)
    tmin = jnp.full((N,), 1e-3, jnp.float32)
    tmax = jnp.full((N,), jnp.inf, jnp.float32)

    kh, kl = _ray_sort_key(scene, o, d, tmin, tmax)
    order = jnp.lexsort((kl, kh))
    os_, ds_ = o[order], d[order]
    jax.block_until_ready((o, d, os_, ds_))

    # 64-row clusters over the (already morton-ordered) sphere table.
    cnp = np.asarray(scene.sph_center)
    rnp = np.asarray(scene.sph_radius)[:, None]
    pmin, pmax = cnp - rnp, cnp + rnp
    rows64 = ((cnp.shape[0] + 63) // 64) * 64
    c64min, c64max = _cluster_aabbs(pmin, pmax, rows64, 64)
    c64min = jnp.asarray(c64min, jnp.float32)
    c64max = jnp.asarray(c64max, jnp.float32)

    def sph(cl_min, cl_max, prim_tile):
        return jax.jit(lambda o, d, a, b: pk.sphere_closest(
            o, d, a, b, scene.sph_center, scene.sph_radius, scene.sph_mat,
            cluster_min=cl_min, cluster_max=cl_max, prim_tile=prim_tile))

    def anyh(cl, prim_tile, ray_tile):
        return jax.jit(lambda o, d, a, b: pk.any_hit(
            o, d, a, b, scene.sph_center, scene.sph_radius,
            scene.tri_v0, scene.tri_e1, scene.tri_e2,
            sph_cluster=cl, prim_tile=prim_tile, ray_tile=ray_tile))

    s256 = sph(scene.sph_cluster_min, scene.sph_cluster_max, 256)
    s64 = sph(c64min, c64max, 64)
    a256 = anyh((scene.sph_cluster_min, scene.sph_cluster_max), 256, 1024)
    a64 = anyh((c64min, c64max), 64, 1024)

    nhit = lambda r: int(jnp.sum(r[1] >= 0))
    print("sanity closest hits 256 vs 64:",
          nhit(s256(o, d, tmin, tmax)), nhit(s64(o, d, tmin, tmax)))

    timeit("sphere 256-cl  unsorted", s256, (o, d, tmin, tmax))
    timeit("sphere 256-cl  sorted", s256, (os_, ds_, tmin, tmax))
    timeit("sphere 64-cl   unsorted", s64, (o, d, tmin, tmax))
    timeit("sphere 64-cl   sorted", s64, (os_, ds_, tmin, tmax))
    timeit("any_hit 256-cl unsorted (1024L)", a256, (o, d, tmin, tmax))
    timeit("any_hit 256-cl sorted   (1024L)", a256, (os_, ds_, tmin, tmax))
    timeit("any_hit 64-cl  sorted   (1024L)", a64, (os_, ds_, tmin, tmax))


if __name__ == "__main__":
    main()
