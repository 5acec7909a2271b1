"""BASELINE config 5: 120-frame camera sweep of the mesh scene, batched over
whatever device mesh is available (multi-chip via shard_map when >1 device).

Usage: python examples/animate_sweep.py [frames]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from pathtrace_tpu.cli import main

frames = sys.argv[1] if len(sys.argv) > 1 else "120"
sys.exit(main([
    "animate", "--frames", frames, "--width", "640", "--height", "360",
    "--spp", "16", "--max-bounces", "8", "--out-dir", "frames",
]))
