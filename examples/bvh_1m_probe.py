"""Streamed-BVH scale probe: a ~1M-triangle knot, closest + any-hit on TPU.

Evidence for the HBM-streaming design point (ops/bvh_intersect.py): the
triangle table (~64 MB at 1M tris) cannot be VMEM-resident, so the traversal
streams one supergroup per DMA with double-buffered prefetch. This probe
builds the scene through the normal SceneBuilder (SAH ordering), traces a
65,536-ray primary + bounce-like wave through the production intersect()
path (entered-group sort key), and prints one JSON line with Mrays/s.

Run: python examples/bvh_1m_probe.py [n_tris]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pathtrace_tpu.models import scenes  # noqa: E402
from pathtrace_tpu.ops import intersect as ix  # noqa: E402

n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
t0 = time.perf_counter()
scene = scenes.mesh_scene(n_tris=n_tris)
build_s = time.perf_counter() - t0
cam = scenes.mesh_scene_camera(1920, 1080)

N = 65536
rng = np.random.default_rng(11)
pix = rng.choice(1920 * 1080, N, replace=False)
px = jnp.asarray(pix % 1920, jnp.float32)
py = jnp.asarray(pix // 1920, jnp.float32)
o, d = cam.generate_rays(px, py, jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32))

rec = ix.intersect(scene, o, d, 1e-3, jnp.inf, method="bvh")
jax.block_until_ready(rec.t)
REP = 5
for i in range(REP):  # second warm block (first timed span is inflated)
    rec = ix.intersect(scene, o + 1e-6 * i, d, 1e-3, jnp.inf, method="bvh")
jax.block_until_ready(rec.t)
t0 = time.perf_counter()
for i in range(REP):
    rec = ix.intersect(scene, o + 1e-5 * i, d, 1e-3, jnp.inf, method="bvh")
jax.block_until_ready(rec.t)
closest_ms = (time.perf_counter() - t0) / REP * 1e3

occ = ix.occluded(scene, o, d, 1e-3, 5.0, method="bvh")
jax.block_until_ready(occ)
t0 = time.perf_counter()
for i in range(REP):
    occ = ix.occluded(scene, o + 1e-5 * i, d, 1e-3, 5.0, method="bvh")
jax.block_until_ready(occ)
any_ms = (time.perf_counter() - t0) / REP * 1e3

table_mb = scene.tri_v0.shape[0] * 16 * 4 / 2**20
print(json.dumps({
    "n_tris": int(scene.tri_v0.shape[0]),
    "table_mb": round(table_mb, 1),
    "streamed": bool(table_mb > 6.0),
    "build_s": round(build_s, 2),
    "closest_ms_65k": round(closest_ms, 2),
    "anyhit_ms_65k": round(any_ms, 2),
    "closest_mrays_s": round(N / closest_ms / 1e3, 2),
    "hit_frac": round(float(jnp.mean(jnp.isfinite(rec.t))), 4),
    "platform": jax.devices()[0].platform,
}), flush=True)
