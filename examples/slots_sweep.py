"""Config-1 drain-tail study (round 5, VERDICT item 4).

BASELINE config 1 (default-spheres 256x256 @16spp) measured 59.6 Mrays/s at
occupancy 0.45 with the production 16,384-slot pool: the work queue is only
64 items/slot, so inter-slot path-length variance leaves half the lanes idle
by the drain. This sweeps num_slots (and with it items/slot) on the real
chip to find the small-frame optimum and the auto-sizing rule.

Measurement notes (hard-won, CLAUDE.md): ``seed``/``sample_offset`` are
STATIC args of render_pool — varying them re-compiles, so distinct timed
calls perturb the CAMERA (traced) instead; and a single dispatch at this
frame size is ~50 ms where the host round-trip alone is ~40 ms, so the
timed region is K back-to-back async dispatches with one block at the end.

Run: python examples/slots_sweep.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models import scenes
from pathtrace_tpu.pool import busy_count, ray_count, render_pool

W = H = 256
SPP = 16
K = 10


def main():
    scene = scenes.default_spheres()
    cam = scenes.default_spheres_camera(W, H)
    cams = [dataclasses.replace(cam, origin=cam.origin + 1e-5 * i)
            for i in range(K + 4)]

    def go(c, slots):
        return render_pool(
            scene, c, width=W, height=H, spp=SPP, integrator="mis",
            max_bounces=32, num_slots=slots, seed=0,
        )

    for slots in (2048, 4096, 8192, 16384, 32768):
        outs = [go(c, slots) for c in cams[:4]]        # compile + warm x4
        jax.block_until_ready(outs[-1][0])
        t0 = time.perf_counter()
        outs = [go(c, slots) for c in cams[4:]]        # K async dispatches
        jax.block_until_ready([o[0] for o in outs])
        dt = (time.perf_counter() - t0) / K
        img, rays, iters = outs[-1]
        cs = float(jnp.sum(img))
        n_rays = ray_count(rays)
        occ = busy_count(rays) / max(int(iters) * min(slots, W * H), 1)
        print(f"slots {slots:6d}  {dt*1e3:7.1f} ms/frame  "
              f"{n_rays/dt/1e6:6.1f} Mrays/s  occ {occ:.3f}  "
              f"iters {int(iters)}  checksum {cs:.1f}", flush=True)


if __name__ == "__main__":
    main()
