"""Multi-host (DCN) launch path: a real 2-process x 4-CPU-device run.

SURVEY §5's comm-backend row maps the reference's single-process rayon launch
(main.rs:39-59) to "ICI collectives; DCN only for multi-host launch". The
subprocess pair here IS the multi-host launch: two controller processes join
via jax.distributed (tests/_mp_worker.py), build a global hosts-major mesh
with make_global_mesh, and render the production pool path over it. The
parent asserts the gathered multi-process image traces the identical sample
set as the single-process pool (exact ray counts; image equal to float
accumulation order).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from pathtrace_tpu.models import scenes
from pathtrace_tpu.pool import ray_count, render_pool

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pool_render_matches_single_process(tmp_path):
    port = _free_port()
    out = os.path.join(tmp_path, "mp0.npz")
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
        env.update(
            PT_COORDINATOR=f"127.0.0.1:{port}",
            PT_NUM_PROCESSES="2",
            PT_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, "--out", out],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"

    # Single-process oracle: same workload on one device.
    w = h = 16
    scene = scenes.cornell_box()
    camera = scenes.cornell_camera(w, h)
    ref_img, ref_rays, _ = render_pool(
        scene, camera, width=w, height=h, spp=4, integrator="mis",
        max_bounces=5, num_slots=32, seed=13,
    )
    got = np.load(out)
    assert int(got["rays"]) == ray_count(ref_rays)
    np.testing.assert_allclose(
        got["image"], np.asarray(ref_img), rtol=1e-5, atol=1e-5
    )
