"""Benchmark: Mrays/sec/chip on the many-sphere scene (BASELINE config 2/1080p).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured Mrays/s divided by the 500 Mrays/s/chip target
(BASELINE.md). Ray count = actual scene-traversal queries issued by the
wavefront integrator (primary + shadow + peek per live bounce), counted
on-device.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from pathtrace_tpu.integrators import trace_wave
from pathtrace_tpu.models import scenes
from pathtrace_tpu.render import pixel_grid
from pathtrace_tpu.utils import rng as rng_ops

TARGET_MRAYS = 500.0


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    if on_tpu:
        width, height, spp, chunk = 1920, 1080, 4, 129600
    else:  # CI fallback: same code path, smaller load
        width, height, spp, chunk = 256, 256, 1, 16384

    scene = scenes.many_spheres()
    camera = scenes.many_spheres_camera(width, height)
    key = rng_ops.base_key(0)
    ids = pixel_grid(width, height)
    chunks = [ids[i : i + chunk] for i in range(0, ids.shape[0], chunk)]

    # Scene and camera are jit ARGUMENTS, not closure constants — embedding
    # the scene arrays as HLO constants inflates XLA compile time ~40x.
    def run_chunk(scene, camera, chunk_ids, sample_idx):
        keys = rng_ops.pixel_sample_keys(key, chunk_ids, sample_idx)
        jitter = rng_ops.primary_jitter(keys)
        px = chunk_ids % width
        py = chunk_ids // width
        o, d = camera.generate_rays(px, height - 1 - py, jitter)
        rad, rays = trace_wave(
            scene, o, d, keys, integrator="mis", max_bounces=32, return_stats=True
        )
        return jnp.sum(rad, axis=0), rays

    run = jax.jit(run_chunk)

    # Warmup / compile
    r, n = run(scene, camera, chunks[0], 0)
    r.block_until_ready()

    total_rays = 0
    t0 = time.perf_counter()
    acc = None
    for s in range(spp):
        for c in chunks:
            r, nrays = run(scene, camera, c, s)
            acc = r if acc is None else acc + r
            total_rays += int(nrays)
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    spp_per_sec = spp / dt
    result = {
        "metric": "Mrays/sec/chip (many-sphere %dx%d MIS)" % (width, height),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "extra": {
            "platform": platform,
            "spp_per_sec_at_%dx%d" % (width, height): round(spp_per_sec, 4),
            "total_rays": total_rays,
            "wall_s": round(dt, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
