"""Per-kernel device-time attribution for one pool render via the JAX
profiler, through the tunnel.

Round-3's biggest methodological find (docs/PERFORMANCE.md): the device
profiler works through the axon tunnel, and its per-kernel times contradicted
every standalone-probe estimate (they miss hidden costs like the lax.cond
framebuffer copy). This makes that methodology a one-command tool:

    python examples/device_trace.py --scene many-spheres --spp 4
    python examples/device_trace.py --scene mesh --method bvh --slots 65536

Prints the top device ops by total time (name, calls, total ms, % of device
busy time) from the xplane protobuf the profiler writes.
"""

import argparse
import dataclasses
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.pool import render_pool  # noqa: E402

SCENES = {
    "many-spheres": ("many_spheres", "many_spheres_camera"),
    "cornell": ("cornell_box", "cornell_camera"),
    "mesh": ("mesh_scene", "mesh_scene_camera"),
}


def parse_xspace(trace_dir, top=30):
    """Aggregate per-op durations from every device plane in the trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    totals = defaultdict(lambda: [0, 0.0])  # name -> [calls, total_ps]
    device_total_ps = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        # Prefer accelerator planes; fall back to the host-CPU plane (XLA:CPU
        # runs record their ops there) so the tool also works off-TPU.
        planes = [p_ for p_ in xs.planes
                  if "tpu" in p_.name.lower() or "device" in p_.name.lower()]
        if not planes:
            planes = [p_ for p_ in xs.planes if p_.name == "/host:CPU"]
        for plane in planes:
            meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    nm = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                    totals[nm][0] += 1
                    totals[nm][1] += ev.duration_ps
                    device_total_ps += ev.duration_ps
    rows = sorted(totals.items(), key=lambda kv: -kv[1][1])[:top]
    print(f"{'op':<64} {'calls':>7} {'ms':>10} {'%dev':>6}")
    for nm, (calls, ps) in rows:
        print(f"{nm[:64]:<64} {calls:>7} {ps / 1e9:>10.3f} "
              f"{100.0 * ps / max(device_total_ps, 1):>6.2f}")
    print(f"device busy total: {device_total_ps / 1e9:.3f} ms "
          f"(sum over device-plane events; overlapping lines double-count)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", choices=sorted(SCENES), default="many-spheres")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--slots", type=int, default=16384)
    ap.add_argument("--max-bounces", type=int, default=32)
    ap.add_argument("--method", default=None,
                    help="traversal override (render_pool method=)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", default=None,
                    help="keep the raw trace in this directory")
    args = ap.parse_args()

    scene_fn, cam_fn = SCENES[args.scene]
    scene = getattr(scenes, scene_fn)()
    cam = getattr(scenes, cam_fn)(args.width, args.height)

    def run(c):
        return render_pool(
            scene, c, width=args.width, height=args.height, spp=args.spp,
            integrator="mis", max_bounces=args.max_bounces,
            num_slots=args.slots, seed=0, method=args.method,
        )

    # Untimed compile/warm on a perturbed camera (identical shapes).
    img, rays, iters = run(dataclasses.replace(cam, origin=cam.origin + 1e-4))
    float(jnp.sum(img))

    trace_dir = args.keep or tempfile.mkdtemp(prefix="pt_trace_")
    with jax.profiler.trace(trace_dir):
        img, rays, iters = run(cam)
        float(jnp.sum(img))  # force completion inside the trace
    print(f"trace in {trace_dir}; pool iterations: {int(iters)}")
    parse_xspace(trace_dir, top=args.top)


if __name__ == "__main__":
    main()
