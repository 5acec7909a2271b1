"""Command-line interface.

The reference has zero runtime flags — integrator choice is a cargo feature
rebuild and every parameter is a compile-time constant (Cargo.toml:6-10,
world.rs:16-18). Here everything is runtime configuration:

    python -m pathtrace_tpu render --scene cornell --width 400 --height 400 \
        --spp 256 --integrator mis --out out.png --luminance-csv luminance.csv

    python -m pathtrace_tpu render --scene mesh --engine pool --progressive 32 \
        --checkpoint state.npz --resume

    python -m pathtrace_tpu animate --scene mesh --frames 24 --out-dir frames/

    python -m pathtrace_tpu bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


SCENES = {
    "cornell": ("cornell_box", "cornell_camera"),
    "default-spheres": ("default_spheres", "default_spheres_camera"),
    "many-spheres": ("many_spheres", "many_spheres_camera"),
    "mesh": ("mesh_scene", "mesh_scene_camera"),
}


def _build(args):
    from .models import scenes as S

    scene_fn, cam_fn = SCENES[args.scene]
    scene = getattr(S, scene_fn)()
    camera = getattr(S, cam_fn)(args.width, args.height)
    return scene, camera


def cmd_render(args) -> int:
    import jax.numpy as jnp

    from . import io as ptio
    from .render import RenderConfig, RenderState, render, to_srgb_u8
    from .pool import render_pool

    scene, camera = _build(args)
    dtype = jnp.float64 if args.dtype == "f64" else None
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        integrator=args.integrator,
        max_bounces=args.max_bounces,
        seed=args.seed,
        samples_per_batch=args.samples_per_batch,
        num_light_samples=args.light_samples,
        dtype=dtype,
    )
    if args.light_samples != 1 and args.engine != "wave":
        print("--light-samples requires --engine wave (the pool megakernel "
              "is fixed at the reference's NUM_LIGHT_SAMPLES=1)",
              file=sys.stderr)
        return 2

    state = None
    if args.resume and args.checkpoint and os.path.exists(args.checkpoint):
        state = RenderState.load(args.checkpoint)
        print(f"resumed at {state.num_samples} spp", file=sys.stderr)

    t0 = time.time()
    if args.engine == "pool":
        done = state.num_samples if state else 0
        image_sum = state.image_sum.reshape(-1, 3) if state else None
        step = args.progressive or (args.spp - done)
        while done < args.spp:
            n = min(step, args.spp - done)
            img, rays, iters = render_pool(
                scene, camera, width=args.width, height=args.height, spp=n,
                integrator=args.integrator, max_bounces=args.max_bounces,
                num_slots=args.pool_slots, seed=args.seed, sample_offset=done,
                dtype=dtype,
            )
            image_sum = img if image_sum is None else image_sum + img
            done += n
            state = RenderState(image_sum.reshape(args.height, args.width, 3), done)
            if args.checkpoint:
                state.save(args.checkpoint)
            if args.out and args.progressive:
                # Progressive preview: the wavefront-era replacement for the
                # reference's live window (main.rs:79-90).
                ptio.write_png(to_srgb_u8(jnp.asarray(state.image)), args.out)
            print(f"{done}/{args.spp} spp ({time.time() - t0:.1f}s)", file=sys.stderr)
    else:
        def progress(dn):
            print(f"{dn}/{args.spp} spp ({time.time() - t0:.1f}s)", file=sys.stderr)
            if args.checkpoint:
                pass  # saved at end; wave engine checkpoints via RenderState

        state = render(scene, camera, cfg, state=state, progress_callback=progress)
        if args.checkpoint:
            state.save(args.checkpoint)

    image = np.asarray(state.image)
    dt = time.time() - t0
    print(f"rendered {args.spp} spp in {dt:.1f}s", file=sys.stderr)

    if args.out:
        ptio.write_png(to_srgb_u8(jnp.asarray(image)), args.out)
        print(f"wrote {args.out}", file=sys.stderr)
    if args.luminance_csv:
        ptio.export_luminance_csv(image, args.luminance_csv)
        print(f"wrote {args.luminance_csv}", file=sys.stderr)
    if args.npy:
        ptio.save_npy(image, args.npy)
    return 0


def cmd_animate(args) -> int:
    import jax.numpy as jnp

    from . import io as ptio
    from .models import scenes as S
    from .parallel.sharding import frames_sharded, make_mesh
    from .render import RenderConfig, to_srgb_u8

    scene = S.mesh_scene() if args.scene == "mesh" else _build(args)[0]
    cams = S.sweep_cameras(args.frames, args.width, args.height)
    cfg = RenderConfig(
        width=args.width, height=args.height, spp=args.spp,
        integrator=args.integrator, max_bounces=args.max_bounces, seed=args.seed,
        samples_per_batch=min(args.spp, 8),
    )
    os.makedirs(args.out_dir, exist_ok=True)
    import jax

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    t0 = time.time()
    if mesh is not None:
        images = frames_sharded(scene, cams, cfg, mesh)
    else:
        from .render import render

        images = [render(scene, c, cfg).image for c in cams]
    for i, img in enumerate(images):
        ptio.write_png(to_srgb_u8(jnp.asarray(img)), os.path.join(args.out_dir, f"frame_{i:04d}.png"))
    print(f"{args.frames} frames in {time.time() - t0:.1f}s -> {args.out_dir}", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench

    return bench.main() or 0


def cmd_debug_pixel(args) -> int:
    from .debug import replay_pixel

    scene, camera = _build(args)
    report = replay_pixel(
        scene, camera, args.x, args.y,
        width=args.width, height=args.height, spp=args.spp,
        integrator=args.integrator, seed=args.seed,
        luminance_threshold=args.threshold,
    )
    print(json.dumps(report, indent=2))
    return 0


def main(argv=None) -> int:
    # The TPU tunnel plugin in some environments ignores JAX_PLATFORMS;
    # honor it explicitly so `JAX_PLATFORMS=cpu` reliably forces CPU.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    p = argparse.ArgumentParser(prog="pathtrace_tpu")
    # Multi-host launch (one process per host; parallel/distributed.py).
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port for multi-host runs "
                        "(jax.distributed); also PT_COORDINATOR")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total processes in the multi-host run")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in the multi-host run")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", choices=sorted(SCENES), default="cornell")
        sp.add_argument("--width", type=int, default=400)   # world.rs:16
        sp.add_argument("--height", type=int, default=400)  # world.rs:17
        sp.add_argument("--spp", type=int, default=64)
        sp.add_argument("--integrator", choices=["mis", "nee", "brdf_only"], default="mis")
        sp.add_argument("--max-bounces", type=int, default=64)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument(
            "--dtype",
            choices=["f32", "f64"],
            default="f32",
            help="estimator compute precision; f64 matches the reference's "
            "native precision (math.rs:4-8) and flips the process-global "
            "jax_enable_x64 switch at startup",
        )
        sp.add_argument(
            "--method",
            choices=["auto", "pallas", "binned", "resident", "bvh", "bruteforce"],
            default="auto",
            help="intersection traversal (auto = platform default with "
            "per-wave coherence routing; binned/resident/bvh = per-ray "
            "front-to-back orders for big meshes, bvh = two-level "
            "union-sweep hierarchy)",
        )

    r = sub.add_parser("render", help="render a still image")
    common(r)
    r.add_argument("--engine", choices=["wave", "pool"], default="pool")
    r.add_argument("--light-samples", type=int, default=1,
                   help="NEE light samples per vertex (rendering.rs:10); "
                        "wave engine only")
    r.add_argument("--samples-per-batch", type=int, default=4)
    r.add_argument("--pool-slots", type=int, default=32768)
    r.add_argument("--progressive", type=int, default=0,
                   help="checkpoint every N spp (pool engine)")
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--out", default="render.png")
    r.add_argument("--luminance-csv", default=None,
                   help="reference-format pre-gamma dump (world.rs:344-369)")
    r.add_argument("--npy", default=None)
    r.set_defaults(fn=cmd_render)

    a = sub.add_parser("animate", help="batched camera-sweep animation")
    common(a)
    a.add_argument("--frames", type=int, default=120)
    a.add_argument("--out-dir", default="frames")
    a.set_defaults(fn=cmd_animate, scene="mesh", width=640, height=360, spp=16)

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.set_defaults(fn=cmd_bench)

    d = sub.add_parser("debug-pixel", help="replay every sample of one pixel")
    common(d)
    d.add_argument("--x", type=int, required=True)
    d.add_argument("--y", type=int, required=True)
    d.add_argument("--threshold", type=float, default=10.0)
    d.set_defaults(fn=cmd_debug_pixel)

    args = p.parse_args(argv)
    if args.coordinator or args.num_processes or os.environ.get("PT_COORDINATOR"):
        # Must run before any backend touch (device enumeration pins the
        # single-process runtime).
        from .parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    if getattr(args, "dtype", "f32") == "f64":
        # Must flip before any array is created (process-global switch).
        import jax

        jax.config.update("jax_enable_x64", True)
    if getattr(args, "method", "auto") != "auto":
        from .ops.intersect import set_default_method

        set_default_method(args.method)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
