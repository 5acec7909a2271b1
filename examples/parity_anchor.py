"""Full-frame TPU-vs-golden parity anchor (round 5, VERDICT item 3).

Renders the reference workload (Cornell 400x400, MIS — world.rs:16-18) with
the PRODUCTION pool defaults at HEAD (megakernel / quad tables / interval
any-hit / BVH routing, whatever resolve_auto picks for this scene) in
watchdog-safe passes, and reports pre-gamma RMSE + mean channel bias against
the pinned 8192-spp f64 oracle golden
(tests/golden/oracle_cornell_400_mis_8192.npz).

Run on the chip:  python examples/parity_anchor.py [spp_total]
Record the result + commit hash in docs/PARITY.md.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np

from pathtrace_tpu.models import scenes
from pathtrace_tpu.pool import render_pool

W = H = 400
PASS_SPP = 2048          # bounds each dispatch well under the remote
                         # runtime's multi-minute watchdog (PERFORMANCE.md)


def main():
    spp_total = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16384
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "tests", "golden", "oracle_cornell_400_mis_8192.npz",
    )
    golden = np.load(path)["image"]           # (H, W, 3) pre-gamma mean
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(W, H)

    acc = np.zeros((H * W, 3), np.float64)
    done = 0
    t0 = time.time()
    while done < spp_total:
        n = min(PASS_SPP, spp_total - done)
        img, rays, iters = render_pool(
            sc, cam, width=W, height=H, spp=n, integrator="mis",
            sample_offset=done,
        )
        acc += np.asarray(img, np.float64)
        done += n
        print(f"pass done: {done}/{spp_total} spp "
              f"({time.time() - t0:.1f} s)", flush=True)
    mean = (acc / spp_total).reshape(H, W, 3)

    diff = mean - golden
    rmse = float(np.sqrt((diff ** 2).mean()))
    bias = diff.reshape(-1, 3).mean(axis=0)
    # Pre-gamma luminance (the reference's CSV artifact, world.rs:344-369).
    lum_w = np.array([0.2126, 0.7152, 0.0722])
    lum_rmse = float(np.sqrt(((diff @ lum_w) ** 2).mean()))
    print(f"spp={spp_total}  RMSE={rmse:.6f}  luminance RMSE={lum_rmse:.6f}")
    print(f"mean channel bias: {bias}")
    print(f"expected MC floor ~ sqrt(1/{spp_total} + 1/8192)*sigma1; "
          f"budget 1e-2 (BASELINE.md)")


if __name__ == "__main__":
    main()
