"""End-to-end pool iteration cost attribution via the PT_POOL_ABLATE hooks.

Runs the production pool on the bench scene with one ablation per process
(the env var is read at trace time, so each variant needs a fresh process)
and prints wall seconds / iteration count / us-per-iteration.

Usage:
    python examples/profile_pool.py            # run all variants (subprocesses)
    python examples/profile_pool.py --one X    # run variant X in-process

Variants: full, nornd (constant uniforms), noraygen (skip camera math),
noshadow (skip the any-hit dispatch), noflush (drop the framebuffer ring).
Ablated runs render a WRONG image — this is cost attribution only.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["full", "nornd", "noraygen", "noshadow", "noflush"]


def run_one(ablate: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.pool import render_pool

    W, H, SPP = 1920, 1080, 8
    scene = scenes.many_spheres()
    cam = scenes.many_spheres_camera(W, H)

    def go(c, off):
        return render_pool(
            scene, c, width=W, height=H, spp=SPP, integrator="mis",
            max_bounces=8, num_slots=16384, seed=0, sample_offset=off,
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
        "wall_s": round(dt, 4),
        "iters": it,
        "us_per_iter": round(dt / it * 1e6, 1),
        "checksum": checksum,
    }), flush=True)


def main() -> None:
    if "--one" in sys.argv:
        run_one(os.environ.get("PT_POOL_ABLATE", ""))
        return
    env_base = dict(os.environ)
    for v in VARIANTS:
        env = dict(env_base)
        env["PT_POOL_ABLATE"] = "" if v == "full" else v
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=env, check=False,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )


if __name__ == "__main__":
    main()
