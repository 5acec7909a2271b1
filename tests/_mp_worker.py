"""Multi-process worker for tests/test_distributed.py.

Launched twice (PT_PROCESS_ID=0/1) with 4 virtual CPU devices each; the two
processes join into one 8-device JAX runtime via the coordinator and render
the same tiny pool workload over a global (dp=4, sp=2) mesh. Writes the
globally-gathered image + ray count to --out for the parent to compare
against the single-process oracle.
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla:
    os.environ["XLA_FLAGS"] = (
        xla + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.parallel import distributed as dist  # noqa: E402
from pathtrace_tpu.parallel.sharding import render_pool_sharded  # noqa: E402
from pathtrace_tpu.pool import ray_count  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    dist.initialize()  # PT_COORDINATOR / PT_NUM_PROCESSES / PT_PROCESS_ID env
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    mesh = dist.make_global_mesh(dp=4, sp=2)
    # Host containment of the psum axis: every sp pair must be same-process.
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, mesh.devices

    w = h = 16
    scene = scenes.cornell_box()
    camera = scenes.cornell_camera(w, h)
    img, rays, iters = render_pool_sharded(
        scene, camera, mesh=mesh, width=w, height=h, spp=4,
        integrator="mis", max_bounces=5, num_slots=32, seed=13,
    )
    img_g = dist.gather_global(img)
    rays_g = dist.gather_global(rays)
    n_rays = ray_count(rays_g)
    if jax.process_index() == 0:
        np.savez(args.out, image=img_g, rays=n_rays)
    print(f"proc {jax.process_index()} ok rays={n_rays}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
