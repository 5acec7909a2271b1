"""Benchmark: Mrays/sec/chip on the many-sphere scene at 1080p (BASELINE).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline = measured Mrays/s / 500 (the BASELINE.md target).

Uses the persistent-pool wavefront renderer (pathtrace_tpu/pool.py) — the
production path: path regeneration keeps slot occupancy ~100%, and the ray
counter is maintained on device (traced primary+bounce rays plus NEE shadow
rays, i.e. actual scene-traversal queries).

Timing notes for this environment: the TPU is reached through a tunnel whose
dispatch pipelining can hide incomplete work, so the timed region is closed by
forcing a host transfer of the result sums; compilation happens in an untimed
warmup call with a perturbed camera (same shapes, different values).
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
# The TPU tunnel plugin in this environment ignores the JAX_PLATFORMS env
# var; honor it explicitly so a CPU run can be forced.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.pool import busy_count, ray_count, render_pool  # noqa: E402

TARGET_MRAYS = 500.0


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    if on_tpu and not os.environ.get("PT_BENCH_SMALL"):
        width, height, spp, slots = 1920, 1080, 16, 16384
    else:  # CI / CPU fallback: same code path, smaller load
        width, height, spp, slots = 128, 128, 1, 4096

    scene = scenes.many_spheres()
    camera = scenes.many_spheres_camera(width, height)

    def run(cam):
        return render_pool(
            scene,
            cam,
            width=width,
            height=height,
            spp=spp,
            integrator="mis",
            max_bounces=32,
            num_slots=slots,
            seed=0,
        )

    f = jax.jit(run)

    # Untimed warmup/compile on a perturbed camera (identical shapes).
    warm_cam = dataclasses.replace(camera, origin=camera.origin + 1e-4)
    img, rays, iters = f(warm_cam)
    float(jnp.sum(img))

    t0 = time.perf_counter()
    img, rays, iters = f(camera)
    total = float(jnp.sum(img))  # forces completion + host transfer
    dt = time.perf_counter() - t0

    nrays = ray_count(rays)
    mrays = nrays / dt / 1e6
    result = {
        "metric": "Mrays/sec/chip (many-sphere %dx%d @%dspp MIS)" % (width, height, spp),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "extra": {
            "platform": platform,
            "spp_per_sec": round(spp / dt, 4),
            "total_rays": nrays,
            "pool_iterations": int(iters),
            "occupancy": round(
                busy_count(rays) / max(int(iters) * min(slots, width * height), 1), 4
            ),
            "wall_s": round(dt, 3),
            "image_checksum": round(total, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
