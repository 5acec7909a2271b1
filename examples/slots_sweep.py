"""Config-1 drain-tail study (round 5, VERDICT item 4).

BASELINE config 1 (default-spheres 256x256 @16spp) measured 59.6 Mrays/s at
occupancy 0.45 with the production 16,384-slot pool: the work queue is only
64 items/slot, so inter-slot path-length variance leaves half the lanes idle
by the drain. This sweeps num_slots (and with it items/slot) on the real
chip to find the small-frame optimum and the auto-sizing rule.

Run: python examples/slots_sweep.py
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
from pathtrace_tpu.pool import busy_count, ray_count, render_pool

W = H = 256
SPP = 16


def run_once(scene, cam, slots, seed):
    img, rays, iters = render_pool(
        scene, cam, width=W, height=H, spp=SPP, integrator="mis",
        max_bounces=32, num_slots=slots, seed=seed,
    )
    jax.block_until_ready(img)
    return img, rays, int(iters)


def main():
    scene = scenes.default_spheres()
    cam = scenes.default_spheres_camera(W, H)
    for slots in (2048, 4096, 8192, 16384, 32768):
        run_once(scene, cam, slots, 0)          # compile
        run_once(scene, cam, slots, 1)          # warm (first block ~2x)
        t0 = time.perf_counter()
        img, rays, iters = run_once(scene, cam, slots, 2)
        cs = float(jnp.sum(img))
        dt = time.perf_counter() - t0
        n_rays = ray_count(rays)
        occ = busy_count(rays) / max(iters * min(slots, W * H), 1)
        print(f"slots {slots:6d}  {dt*1e3:7.1f} ms  "
              f"{n_rays/dt/1e6:6.1f} Mrays/s  occ {occ:.3f}  "
              f"iters {iters}  checksum {cs:.1f}", flush=True)


if __name__ == "__main__":
    main()
