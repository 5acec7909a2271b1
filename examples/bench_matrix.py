"""Measure every BASELINE.md benchmark config end to end.

Usage:  python examples/bench_matrix.py [--config N] [--quick]

Prints one JSON line per config with the measured wall seconds, Mrays/s
(counted scene-traversal queries / wall), spp/s, and the image checksum.
``--quick`` shrinks spp for smoke runs; the recorded docs/PERFORMANCE.md
matrix uses full settings.

Configs (BASELINE.json):
  1  default sphere scene, 256x256 @ 16 spp
  2  random many-sphere scene (metal+dielectric), 512x512 @ 64 spp
  3  Cornell box (triangle walls + area light), 1024x1024 @ 256 spp
  4  ~70k-tri mesh, 1080p, depth-8, progressive (measured per pass)
  5  120-frame camera sweep, 640x360 @ 16 spp (wall seconds per frame)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.pool import busy_count, ray_count, render_pool  # noqa: E402


def _run_pool(scene, camera, *, width, height, spp, max_bounces, slots,
              sample_offset=0, warm=True):
    """Compile (untimed, perturbed camera) then run once, timed."""
    def go(cam, off):
        return render_pool(
            scene, cam, width=width, height=height, spp=spp,
            integrator="mis", max_bounces=max_bounces, num_slots=slots,
            seed=0, sample_offset=off,
        )

    if warm:
        img, rays, iters = go(
            dataclasses.replace(camera, origin=camera.origin + 1e-4),
            sample_offset,
        )
        float(jnp.sum(img))
    t0 = time.perf_counter()
    img, rays, iters = go(camera, sample_offset)
    checksum = float(jnp.sum(img))
    dt = time.perf_counter() - t0
    n = ray_count(rays)
    occ = busy_count(rays) / max(int(iters) * min(slots, width * height), 1)
    return dict(
        wall_s=round(dt, 3),
        mrays_s=round(n / dt / 1e6, 2),
        spp_per_s=round(spp / dt, 3),
        total_rays=n,
        occupancy=round(occ, 4),
        image_checksum=round(checksum, 1),
    )


def config1(quick):
    spp = 4 if quick else 16
    sc = scenes.default_spheres()
    cam = scenes.default_spheres_camera(256, 256)
    r = _run_pool(sc, cam, width=256, height=256, spp=spp, max_bounces=32,
                  slots=16384)
    return {"config": 1, "workload": f"default-spheres 256x256 @{spp}spp MIS", **r}


def config2(quick):
    spp = 8 if quick else 64
    sc = scenes.many_spheres()
    cam = scenes.many_spheres_camera(512, 512)
    r = _run_pool(sc, cam, width=512, height=512, spp=spp, max_bounces=32,
                  slots=16384)
    return {"config": 2, "workload": f"many-spheres 512x512 @{spp}spp MIS", **r}


def config3(quick):
    spp = 16 if quick else 256
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(1024, 1024)
    r = _run_pool(sc, cam, width=1024, height=1024, spp=spp, max_bounces=64,
                  slots=16384)
    return {"config": 3, "workload": f"cornell 1024x1024 @{spp}spp MIS", **r}


def config4(quick):
    spp = 1 if quick else 4
    sc = scenes.mesh_scene()
    cam = scenes.mesh_scene_camera(1920, 1080)
    r = _run_pool(sc, cam, width=1920, height=1080, spp=spp, max_bounces=8,
                  slots=65536)
    return {
        "config": 4,
        "workload": f"mesh-70k 1920x1080 @{spp}spp depth-8 MIS (progressive rate)",
        **r,
    }


def config5(quick):
    from pathtrace_tpu.parallel.sharding import frames_pool_sharded, make_mesh
    from pathtrace_tpu.render import RenderConfig

    frames = 4 if quick else 120
    spp = 16
    w, h = 640, 360
    sc = scenes.mesh_scene()
    cfg = RenderConfig(width=w, height=h, spp=spp, integrator="mis",
                       max_bounces=8, seed=0)
    mesh = make_mesh()  # all local devices on the frame axis
    cams = scenes.sweep_cameras(num_frames=frames, width=w, height=h)

    # Untimed compile: one CHUNK of the chunked sweep (same executable is
    # reused for every chunk of the timed run), cameras perturbed.
    chunk = 8
    warm = [dataclasses.replace(c, origin=c.origin + 1e-4)
            for c in cams[: chunk * len(jax.devices())]]
    out, _, _ = frames_pool_sharded(sc, warm, cfg, mesh, num_slots=32768,
                                    chunk_frames=chunk)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    imgs, rays, iters = frames_pool_sharded(sc, cams, cfg, mesh,
                                            num_slots=32768,
                                            chunk_frames=chunk)
    checksum = float(jnp.sum(imgs))
    dt = time.perf_counter() - t0
    total_rays = ray_count(rays)
    return {
        "config": 5,
        "workload": (
            f"camera sweep {frames} frames {w}x{h} @{spp}spp MIS "
            f"(chunked pool frame batch, {mesh.shape} mesh)"
        ),
        "wall_s": round(dt, 3),
        "s_per_frame": round(dt / frames, 4),
        "mrays_s": round(total_rays / dt / 1e6, 2),
        "total_rays": total_rays,
        "image_checksum": round(checksum, 1),
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0, help="1-5; 0 = all")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    todo = [args.config] if args.config else [1, 2, 3, 4, 5]
    for c in todo:
        res = CONFIGS[c](args.quick)
        res["platform"] = jax.devices()[0].platform
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
