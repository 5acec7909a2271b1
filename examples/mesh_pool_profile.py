"""Config-4 (70k-tri mesh @1080p) in-pool cost attribution.

Runs the production pool on the mesh scene with PT_POOL_ABLATE variants and a
slot-count sweep, printing wall seconds / iterations / us-per-iteration /
Mrays/s per run. Ablated runs render a WRONG image — attribution only.

Usage:
    python examples/mesh_pool_profile.py                 # ablations at 64k
    python examples/mesh_pool_profile.py --slots         # slot sweep, full
    python examples/mesh_pool_profile.py --one X [S]     # one variant in-proc
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["full", "noshadow", "nornd", "noraygen", "noflush"]
SLOTS = [32768, 65536, 131072, 262144]


def run_one(ablate: str, slots: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.pool import ray_count, render_pool

    W, H, SPP = 1920, 1080, 1
    scene = scenes.mesh_scene()
    cam = scenes.mesh_scene_camera(W, H)

    def go(c, off):
        return render_pool(
            scene, c, width=W, height=H, spp=SPP, integrator="mis",
            max_bounces=8, num_slots=slots, seed=0, sample_offset=off,
        )

    import dataclasses

    img, rays, iters = go(dataclasses.replace(cam, origin=cam.origin + 1e-4), 0)
    float(jnp.sum(img))  # compile + warm
    t0 = time.perf_counter()
    img, rays, iters = go(cam, 0)
    checksum = float(jnp.sum(img))
    dt = time.perf_counter() - t0
    it = int(iters)
    print(json.dumps({
        "ablate": ablate or "full",
        "slots": slots,
        "wall_s": round(dt, 4),
        "iters": it,
        "ms_per_iter": round(dt / it * 1e3, 3),
        "mrays_s": round(ray_count(rays) / dt / 1e6, 3),
        "checksum": round(checksum, 1),
    }), flush=True)


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        slots = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 65536
        run_one(os.environ.get("PT_POOL_ABLATE", ""), slots)
        return
    env_base = dict(os.environ)
    if "--slots" in sys.argv:
        jobs = [("full", s) for s in SLOTS]
    else:
        jobs = [(v, 65536) for v in VARIANTS]
    for v, s in jobs:
        env = dict(env_base)
        env["PT_POOL_ABLATE"] = "" if v == "full" else v
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", v, str(s)],
            env=env, check=False,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )


if __name__ == "__main__":
    main()
