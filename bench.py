"""Benchmark: Mrays/sec/chip on the many-sphere scene at 1080p (BASELINE).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline = measured Mrays/s / 500 (the BASELINE.md target).

Uses the persistent-pool wavefront renderer (pathtrace_tpu/pool.py) — the
production path: path regeneration keeps slot occupancy ~100%, and the ray
counter is maintained on device (traced primary+bounce rays plus NEE shadow
rays, i.e. actual scene-traversal queries).

Outage-proofing (round-4): the TPU here is reached through a tunnel that can
wedge for hours; merely calling ``jax.devices()`` then raises or hangs. So
this script runs as a SUPERVISOR that never touches the axon plugin itself:
it launches the actual benchmark in a timeout-guarded child subprocess, and
if the TPU child fails or hangs it re-runs the child on CPU (which the axon
plugin cannot block: the child pins ``jax_platforms=cpu`` before any device
query). The supervisor therefore always exits 0 with one parseable JSON line.

Timing notes for this environment: the TPU tunnel's dispatch pipelining can
hide incomplete work, so the timed region is closed by forcing a host
transfer of the result sums; compilation happens in an untimed warmup call
with a perturbed camera (same shapes, different values).
"""

import json
import os
import subprocess
import sys

TARGET_MRAYS = 500.0

# Generous: remote compiles through the tunnel vary 5-400 s; the timed run
# itself is ~1.5 s. The driver's own timeout is unknown but was >40 min in
# round 3, so 25 min for the TPU attempt leaves room for the CPU fallback.
TPU_CHILD_TIMEOUT_S = int(os.environ.get("PT_BENCH_TPU_TIMEOUT", "1500"))
CPU_CHILD_TIMEOUT_S = int(os.environ.get("PT_BENCH_CPU_TIMEOUT", "900"))


def _bench_child():
    """The actual benchmark. Runs in a subprocess; prints one JSON line."""
    import dataclasses
    import time

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # explicitly so the supervisor's CPU fallback actually lands on CPU.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from pathtrace_tpu.models import scenes
    from pathtrace_tpu.pool import busy_count, ray_count, render_pool

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


def _run_child(extra_env, timeout_s):
    """Run this script as a bench child; return its parsed JSON line or None."""
    env = dict(os.environ)
    env["_PT_BENCH_CHILD"] = "1"
    env.update(extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None, "timeout after %ds" % timeout_s
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except (json.JSONDecodeError, ValueError):
            continue
    tail = (proc.stderr or "").strip().splitlines()[-3:]
    return None, "rc=%d %s" % (proc.returncode, " | ".join(tail))


def main():
    if os.environ.get("_PT_BENCH_CHILD"):
        _bench_child()
        return 0

    attempts = []
    force_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    if not force_cpu:
        result, err = _run_child({}, TPU_CHILD_TIMEOUT_S)
        if result is not None:
            print(json.dumps(result))
            return 0
        attempts.append("tpu: %s" % err)

    # TPU unreachable (or CPU forced): same code path on host CPU.
    result, err = _run_child(
        {"JAX_PLATFORMS": "cpu", "PT_BENCH_SMALL": "1"}, CPU_CHILD_TIMEOUT_S
    )
    if result is not None:
        if attempts:
            result["extra"]["fallback_reason"] = "; ".join(attempts)
        print(json.dumps(result))
        return 0
    attempts.append("cpu: %s" % err)

    # Last resort: still emit one parseable JSON line rather than dying.
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (many-sphere MIS)",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "extra": {"platform": "none", "error": "; ".join(attempts)},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
