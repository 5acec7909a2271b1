"""Per-kernel microbenchmark on the real chip.

Times each intersection kernel and the fused shading remainder at the pool's
production working set, with the benchmark hygiene this environment requires
(distinct inputs per timed call, forced host transfer closing the region).

Usage: python examples/kernel_microbench.py [n_rays]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.ops import pallas_intersect as pk  # noqa: E402
from pathtrace_tpu.ops.intersect import intersect, occluded  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
REPS = 256


def timed(name, fn, *args_list):
    """args_list: list of REPS distinct (o, d) tuples.

    One host round-trip through the TPU tunnel costs ~40 ms, so individual
    dispatches measure the tunnel, not the kernel. All reps run inside a
    single jitted lax.scan (stacked inputs, carried checksum), matching how
    the pool's while_loop invokes the kernels on device.
    """
    os_ = jnp.stack([a[0] for a in args_list])
    ds_ = jnp.stack([a[1] for a in args_list])

    @jax.jit
    def run(os_, ds_):
        def step(c, od):
            out = fn(*od)
            leaf = jax.tree.leaves(out)[0]
            return c + jnp.sum(leaf.astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), (os_, ds_))
        return c

    float(run(os_, ds_))  # compile + warm
    # Timed dispatch uses DISTINCT inputs (identical redispatches can be
    # elided by the tunnel runtime).
    os2 = os_ + 1e-4
    t0 = time.perf_counter()
    float(run(os2, ds_))
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:42s} {dt*1e3:8.3f} ms  ({N/dt/1e6:8.1f} Mrays/s)")
    return dt


def ray_batches(key, n, reps, spread=12.0):
    """Incoherent ray sets (pool-like): origins in the scene bulk, random dirs."""
    ks = jax.random.split(key, reps)
    sets = []
    for k in ks:
        o = jax.random.uniform(k, (n, 3), minval=-spread, maxval=spread) * jnp.asarray([1.0, 0.15, 1.0]) + jnp.asarray([0.0, 1.0, 0.0])
        d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        sets.append((o, d))
    return sets


def main():
    print(f"platform={jax.devices()[0].platform}  N={N}")
    sc = scenes.many_spheres()
    key = jax.random.key(0)
    rays = ray_batches(key, N, REPS)
    tmin = jnp.full((N,), 1e-3)
    tmax = jnp.full((N,), jnp.inf)

    sph = jax.jit(lambda o, d: pk.sphere_closest(
        o, d, tmin, tmax, sc.sph_center, sc.sph_radius, sc.sph_mat,
        cluster_min=sc.sph_cluster_min, cluster_max=sc.sph_cluster_max))
    timed("sphere_closest (488 sph, incoherent)", sph, *rays)

    tri = jax.jit(lambda o, d: pk.triangle_closest(
        o, d, tmin, tmax, sc.tri_v0, sc.tri_e1, sc.tri_e2, sc.tri_normal,
        sc.tri_mat, prim_tile=8))
    timed("triangle_closest (2 tris, tile 8)", tri, *rays)

    ah = jax.jit(lambda o, d: pk.any_hit(
        o, d, tmin, jnp.full((N,), 3.0), sc.sph_center, sc.sph_radius,
        sc.tri_v0, sc.tri_e1, sc.tri_e2,
        sph_cluster=(sc.sph_cluster_min, sc.sph_cluster_max), ray_tile=512))
    timed("any_hit (488 sph + 2 tri)", ah, *rays)

    full = jax.jit(lambda o, d: intersect(sc, o, d, 1e-3, jnp.inf))
    timed("intersect() full (sph+tri+records)", full, *rays)

    occ = jax.jit(lambda o, d: occluded(sc, o, d, 1e-3, 3.0))
    timed("occluded() full", occ, *rays)

    # Variant probes: sorted rays and finer sphere clusters.
    from pathtrace_tpu.ops.intersect import _ray_sort_key
    from pathtrace_tpu.models.scene import _cluster_aabbs
    import numpy as np

    def sorted_rays(sets):
        out = []
        for o, d in sets:
            kh, kl = _ray_sort_key(sc, o, d, jnp.zeros(o.shape[0]),
                                   jnp.full((o.shape[0],), jnp.inf))
            order = jnp.lexsort((kl, kh))
            out.append((o[order], d[order]))
        return out

    rays_s = sorted_rays(rays)
    timed("sphere_closest (sorted rays)", sph, *rays_s)

    for csize in (64, 32):
        cmin, cmax = _cluster_aabbs(
            np.asarray(sc.sph_center - sc.sph_radius[:, None]),
            np.asarray(sc.sph_center + sc.sph_radius[:, None]),
            -(-sc.sph_center.shape[0] // csize) * csize, csize)
        sphf = jax.jit(lambda o, d, cmin=jnp.asarray(cmin, jnp.float32),
                       cmax=jnp.asarray(cmax, jnp.float32), csize=csize: pk.sphere_closest(
            o, d, tmin, tmax, sc.sph_center, sc.sph_radius, sc.sph_mat,
            cluster_min=cmin, cluster_max=cmax, prim_tile=csize))
        timed(f"sphere_closest (sorted, {csize}-clusters)", sphf, *rays_s)

    # Mesh scene
    ms = scenes.mesh_scene()
    rays_m = ray_batches(jax.random.key(1), N, 16, spread=3.0)
    tri_m = jax.jit(lambda o, d: pk.triangle_closest(
        o, d, tmin, tmax, ms.tri_v0, ms.tri_e1, ms.tri_e2, ms.tri_normal,
        ms.tri_mat, cluster_min=ms.tri_cluster_min, cluster_max=ms.tri_cluster_max))
    timed("triangle_closest (70k tris, incoherent)", tri_m, *rays_m)

    full_m = jax.jit(lambda o, d: intersect(ms, o, d, 1e-3, jnp.inf))
    timed("intersect() mesh (incl ray sort)", full_m, *rays_m)


if __name__ == "__main__":
    main()
