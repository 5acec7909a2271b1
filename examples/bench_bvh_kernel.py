"""TPU standalone A/B of the BVH union-sweep kernels (round 5).

Times the production ``intersect()``/``occluded()`` BVH path (including the
wave sort) on realistic 65,536-ray waves over the 70k-triangle scene, with
the round-5 lane-gate knob on/off. Run on the real chip:

    python examples/bench_bvh_kernel.py

Measurement hygiene (CLAUDE.md): double-warm before timing, distinct inputs
per call, forced host transfer closing the timed region.
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
from pathtrace_tpu.ops.intersect import intersect, occluded

N = 65536
REPS = 30


def timeit(name, fn, *inputs):
    def step(carry, _):
        o = inputs[0] + carry * 1e-7
        r = fn(o, *inputs[1:])
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None

    run = jax.jit(
        lambda k: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(k))[0],
        static_argnums=0,
    )
    float(run(2)); float(run(REPS))  # compile + double warm
    t0 = time.perf_counter(); float(run(2)); t_short = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(run(REPS)); t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (REPS - 2)
    print(f"{name:46s} {dt*1e3:8.3f} ms/call  ({N/dt/1e6:6.2f} Mrays/s)",
          flush=True)
    return dt


def main():
    scene = scenes.mesh_scene()
    cam = scenes.mesh_scene_camera(320, 205)
    from pathtrace_tpu.utils import rng as rng_ops

    pix = jnp.arange(N, dtype=jnp.int32) % (320 * 205)
    keys = rng_ops.pixel_sample_keys(rng_ops.base_key(1), pix, 0)
    jit = rng_ops.primary_jitter(keys)
    o_p, d_p = cam.generate_rays(pix % 320, 204 - pix // 320, jit)

    h = intersect(scene, o_p, d_p, 1e-3, jnp.inf, method="bvh")
    t = jnp.where(h.valid, h.t, 5.0)
    hp = o_p + t[:, None] * d_p
    rng = np.random.default_rng(7)
    d_b = rng.normal(size=(N, 3))
    d_b = jnp.asarray(d_b / np.linalg.norm(d_b, axis=1, keepdims=True),
                      jnp.float32)
    light = jnp.asarray(
        [scene.sph_center[0, 0], scene.sph_center[0, 1] + 3.0,
         scene.sph_center[0, 2]]
    )
    d_s = light[None] + jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 0.3 - hp
    d_s = d_s / jnp.linalg.norm(d_s, axis=1, keepdims=True)
    jax.block_until_ready((hp, d_b, d_s))

    # A/B axis: env knob name from argv (default the round-5 MXU MT dot),
    # e.g.  python examples/bench_bvh_kernel.py PT_BVH_LANEGATE 0 128
    knob = _sys.argv[1] if len(_sys.argv) > 1 else "PT_BVH_MXU"
    vals = _sys.argv[2:] if len(_sys.argv) > 2 else ["0", "1"]
    for val in vals:
        _os.environ[knob] = val
        tag = f"{knob.replace('PT_BVH_', '').lower()}={val}"
        timeit(f"closest primary {tag}",
               lambda o, d: intersect(scene, o, d, 1e-3, jnp.inf, method="bvh"),
               o_p, d_p)
        timeit(f"closest bounce  {tag}",
               lambda o, d: intersect(scene, o, d, 1e-3, jnp.inf, method="bvh"),
               hp, d_b)
        timeit(f"anyhit shadow   {tag}",
               lambda o, d: occluded(scene, o, d, 1e-3, 4.0, method="bvh"),
               hp, d_s)


if __name__ == "__main__":
    main()
