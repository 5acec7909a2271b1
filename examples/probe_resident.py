"""Resident-table traversal vs the per-tile and binned engines (TPU probe).

Times the three triangle traversal generations on the config-4 mesh scene:
standalone closest-hit + any-hit on a bounce-like incoherent wave, then the
full pool render (1 spp @ 1080p) per method with the cross-checked checksum
(docs/PERFORMANCE.md: 2578947.5).

Usage:
    python examples/probe_resident.py kernels   # standalone kernel ladder
    python examples/probe_resident.py pool M    # pool render, method M
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import intersect as isect

N = 65536
REPS = 10


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
    float(run(2))
    t0 = time.perf_counter(); float(run(2)); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(run(REPS)); tl = time.perf_counter() - t0
    dt = (tl - ts) / (REPS - 2)
    print(f"{name:40s} {dt*1e3:9.3f} ms/call  (sink {v:.3g})", flush=True)


def kernels():
    scene = scenes.mesh_scene()
    key = jax.random.PRNGKey(0)
    lo = jnp.min(scene.tri_cluster_min, axis=0)
    hi = jnp.max(scene.tri_cluster_max, axis=0)
    o_b = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * (hi - lo) + lo
    d_b = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)
    tmin = jnp.full((N,), 1e-3, jnp.float32)
    tmax = jnp.full((N,), jnp.inf, jnp.float32)
    t25 = jnp.full((N,), 2.5, jnp.float32)

    for m in ("pallas", "binned", "resident"):
        close = jax.jit(
            lambda o, d, a, b, m=m: isect.intersect(scene, o, d, a, b, method=m).t
        )
        timeit(f"intersect() bounce [{m}]", close, (o_b, d_b, tmin, tmax))
    for m in ("pallas", "binned", "resident"):
        occ = jax.jit(
            lambda o, d, a, b, m=m: isect.occluded(scene, o, d, a, b, method=m)
        )
        timeit(f"occluded() bounce [{m}]", occ, (o_b, d_b, tmin, t25))


def pool(method):
    import dataclasses

    from pathtrace_tpu.pool import ray_count, render_pool

    if method != "pallas":
        isect.set_default_method(method)
    scene = scenes.mesh_scene()
    cam = scenes.mesh_scene_camera(1920, 1080)

    def go(c, off):
        return render_pool(
            scene, c, width=1920, height=1080, spp=1, integrator="mis",
            max_bounces=8, num_slots=65536, seed=0, sample_offset=off,
        )

    img, rays, iters = go(dataclasses.replace(cam, origin=cam.origin + 1e-4), 0)
    float(jnp.sum(img))
    t0 = time.perf_counter()
    img, rays, iters = go(cam, 0)
    checksum = float(jnp.sum(img))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "method": method, "wall_s": round(dt, 3),
        "mrays_s": round(ray_count(rays) / dt / 1e6, 3),
        "iters": int(iters), "checksum": round(checksum, 1),
    }), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "kernels":
        kernels()
    else:
        pool(sys.argv[2])
