"""Decompose the fused pool iteration: megakernel vs its unfused parts.

Times (a) the bounce megakernel alone, (b) the standalone closest-hit and
any-hit kernels it subsumes, (c) the unfused shading glue, all at production
wave size with the scan-amortized distinct-input pattern (CLAUDE.md hygiene).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import bsdf as bsdf_ops
from pathtrace_tpu.ops import intersect as isect
from pathtrace_tpu.ops import lights as light_ops
from pathtrace_tpu.ops import pallas_intersect as pk
from pathtrace_tpu.ops import pallas_shade as ps
from pathtrace_tpu.utils import vec

N = 16384
REPS = 200


def timeit(name, fn, inputs):
    def step(carry, i):
        o, d = inputs
        o = o + carry * 1e-6
        r = fn(o, d)
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None

    run = jax.jit(
        lambda n: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0],
        static_argnums=0,
    )
    float(run(2))
    float(run(REPS))
    t0 = time.perf_counter()
    float(run(2))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(run(REPS))
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (REPS - 2)
    print(f"{name:34s} {dt*1e6:8.1f} us/call  (sink {v:.3g})", flush=True)
    return dt


def main():
    scene = scenes.many_spheres()
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3), jnp.float32, -3.0, 3.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    jax.block_until_ready((o, d))

    tables = jax.jit(ps.build_tables)(scene)
    jax.block_until_ready(tables)
    busy = jnp.ones((N,), bool)
    bounce = jnp.zeros((N,), jnp.int32)
    eta = jnp.ones((N,))
    pdfp = jnp.ones((N,))
    prefix = jnp.ones((N, 3))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (N, 8))
    tmin = jnp.full((N,), 1e-3)
    tmax = jnp.full((N,), jnp.inf)

    fused = jax.jit(lambda o, d: ps.fused_bounce(
        tables, busy, bounce, o, d, eta, pdfp, prefix, u,
        num_tris=scene.tri_v0.shape[0], num_lights=scene.num_lights,
        integrator="mis", max_bounces=32).rad_delta)
    closest = jax.jit(lambda o, d: isect.intersect(scene, o, d, 1e-3, jnp.inf).t)
    anyh = jax.jit(lambda o, d: isect.occluded(scene, o, d, 1e-3, 20.0))

    def shade_glue(o, d):
        """The unfused shading chain on synthetic hit data (no intersect)."""
        hit_point = o + d * 2.0
        normal = -d
        mid = jnp.zeros((N,), jnp.int32)
        mp = bsdf_ops.mat_of(scene, mid)
        ls = light_ops.sample_light_point(scene, hit_point, u[:, 0], u[:, 1], u[:, 2])
        bsdf_l, pdf_l = bsdf_ops.eval_bsdf(scene, mid, -d, eta, ls.dir, normal, params=mp)
        o2, b2, p2, c2 = bsdf_ops.sample_bsdf(
            scene, mid, -d, eta, normal, u[:, 3], u[:, 4], u[:, 5], params=mp)
        w = ls.pdf / (ls.pdf + pdf_l)
        direct = w[:, None] * bsdf_l * ls.emission * (jnp.abs(vec.dot(normal, ls.dir)) / ls.pdf)[:, None]
        return vec.finite_or_zero(direct) + b2 * (c2 / p2)[:, None] + o2

    glue = jax.jit(shade_glue)

    timeit("fused_bounce (megakernel)", fused, (o, d))
    timeit("intersect (closest, unfused)", closest, (o, d))
    timeit("any_hit (occluded)", anyh, (o, d))
    timeit("shading glue (unfused, no isect)", glue, (o, d))




def sections():
    """Attribute the megakernel's cost to its sections by ablation."""
    scene = scenes.many_spheres()
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3), jnp.float32, -3.0, 3.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    jax.block_until_ready((o, d))
    tables = jax.jit(ps.build_tables)(scene)
    jax.block_until_ready(tables)
    busy = jnp.ones((N,), bool)
    bounce = jnp.zeros((N,), jnp.int32)
    eta = jnp.ones((N,))
    pdfp = jnp.ones((N,))
    prefix = jnp.ones((N, 3))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (N, 8))

    FULL = frozenset({"emis", "nee", "neeeval", "shadow", "sample"})
    variants = [
        ("full", FULL),
        ("-shadow", FULL - {"shadow"}),
        ("-nee (whole NEE block)", FULL - {"nee"}),
        ("-neeeval (mirror eval@light)", FULL - {"neeeval"}),
        ("-sample (mirror VNDF sample)", FULL - {"sample"}),
        ("-emis (MIS light-row select)", FULL - {"emis"}),
        ("closest only", frozenset()),
    ]
    for name, secs in variants:
        fn = jax.jit(lambda o, d, secs=secs: ps.fused_bounce(
            tables, busy, bounce, o, d, eta, pdfp, prefix, u,
            num_tris=scene.tri_v0.shape[0], num_lights=scene.num_lights,
            integrator="mis", max_bounces=32, sections=secs).rad_delta)
        timeit(name, fn, (o, d))



def glue():
    """Time the per-iteration XLA glue pieces at pool scale."""
    from pathtrace_tpu.utils import rng as rng_ops
    from pathtrace_tpu.models import scenes as _scenes

    S = 16384
    key = jax.random.PRNGKey(0)
    base = rng_ops.base_key(0)
    pixel = jax.random.randint(key, (S,), 0, 1 << 20)
    sample = jax.random.randint(jax.random.fold_in(key, 1), (S,), 0, 64)
    bounce = jax.random.randint(jax.random.fold_in(key, 2), (S,), 0, 8)
    cam = _scenes.many_spheres_camera(1920, 1080)
    jax.block_until_ready((pixel, sample, bounce))

    def keys_fn(p, s):
        p = p.astype(jnp.int32)
        return jax.random.key_data(rng_ops.pixel_sample_keys(base, p, s))

    def keys_jitter_fn(p, s):
        p = p.astype(jnp.int32)
        k = rng_ops.pixel_sample_keys(base, p, s)
        return rng_ops.primary_jitter(k)

    def keys_jitter_raygen_fn(p, s):
        p = p.astype(jnp.int32)
        k = rng_ops.pixel_sample_keys(base, p, s)
        j = rng_ops.primary_jitter(k)
        o, d = cam.generate_rays(p % 1920, 1079 - p // 1920, j)
        return o + d

    def uniforms_fn(p, s):
        p = p.astype(jnp.int32)
        k = rng_ops.pixel_sample_keys(base, p, s)
        def draw(kk, b):
            return jax.random.uniform(jax.random.fold_in(kk, b), (rng_ops.NUM_SLOTS,))
        return jax.vmap(draw)(k, bounce)

    for name, fn in [
        ("keys (2x fold_in)", keys_fn),
        ("keys+jitter", keys_jitter_fn),
        ("keys+jitter+raygen", keys_jitter_raygen_fn),
        ("keys+uniforms(8)", uniforms_fn),
    ]:
        f = jax.jit(lambda p, s, fn=fn: fn(p, s))
        timeit(name, f, (pixel, sample))


if __name__ == "__main__":
    import sys

    if "--sections" in sys.argv:
        sections()
    elif "--glue" in sys.argv:
        glue()
    else:
        main()
