import json
import os
import subprocess
import sys

import numpy as np

from pathtrace_tpu.debug import render_pixel_samples, replay_pixel
from pathtrace_tpu.models import scenes
from pathtrace_tpu.render import RenderConfig, render


def test_replay_matches_full_frame():
    """One pixel's replayed samples must average to exactly the full-frame
    renderer's value for that pixel (scheduler-independent RNG)."""
    W = H = 16
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(W, H)
    spp = 8
    st = render(sc, cam, RenderConfig(width=W, height=H, spp=spp, seed=4,
                                      samples_per_batch=spp))
    x, y = 9, 12
    samples = render_pixel_samples(sc, cam, x, y, width=W, height=H, spp=spp, seed=4)
    np.testing.assert_allclose(
        samples.mean(axis=0), np.asarray(st.image)[y, x], rtol=1e-5, atol=1e-5
    )


def test_replay_report_shape():
    W = H = 16
    sc = scenes.cornell_box()
    cam = scenes.cornell_camera(W, H)
    rep = replay_pixel(sc, cam, 8, 8, width=W, height=H, spp=16,
                       luminance_threshold=0.5)
    assert rep["pixel"] == [8, 8]
    assert len(rep["mean_rgb_pre_gamma"]) == 3
    assert rep["max_sample_luminance"] >= rep["mean_luminance"]
    data = json.dumps(rep)
    assert "high_luminance_count" in data


def test_cli_render_and_debug(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = os.path.join(tmp_path, "o.png")
    csv = os.path.join(tmp_path, "l.csv")
    r = subprocess.run(
        [sys.executable, "-m", "pathtrace_tpu", "render", "--scene", "cornell",
         "--width", "24", "--height", "24", "--spp", "2", "--engine", "wave",
         "--out", out, "--luminance-csv", csv],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.exists(csv)

    r = subprocess.run(
        [sys.executable, "-m", "pathtrace_tpu", "debug-pixel", "--scene", "cornell",
         "--width", "24", "--height", "24", "--spp", "4", "--x", "5", "--y", "7"],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout)["pixel"] == [5, 7]


def test_cli_pool_progressive_checkpoint(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    ckpt = os.path.join(tmp_path, "state.npz")
    out = os.path.join(tmp_path, "p.png")
    r = subprocess.run(
        [sys.executable, "-m", "pathtrace_tpu", "render", "--scene", "cornell",
         "--width", "16", "--height", "16", "--spp", "4", "--engine", "pool",
         "--progressive", "2", "--checkpoint", ckpt, "--out", out],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    z = np.load(ckpt)
    assert int(z["num_samples"]) == 4


def test_cli_method_flag(tmp_path):
    """--method routes every subcommand through set_default_method; an
    explicit bruteforce must render identically to the CPU auto default."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    outs = []
    for method in ("auto", "bruteforce"):
        out = os.path.join(tmp_path, f"{method}.npy")
        r = subprocess.run(
            [sys.executable, "-m", "pathtrace_tpu", "render", "--scene",
             "cornell", "--width", "16", "--height", "16", "--spp", "1",
             "--method", method, "--out",
             os.path.join(tmp_path, f"{method}.png"), "--npy", out],
            capture_output=True, text=True, env=env, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(np.load(out))
    np.testing.assert_array_equal(outs[0], outs[1])
