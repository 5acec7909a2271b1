"""BASELINE config 4: the ~70k-triangle mesh scene at 1080p with progressive
accumulation and checkpointing — interrupt and re-run with --resume semantics
(the checkpoint IS the accumulation state).

Usage: python examples/progressive_1080p.py [total_spp]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from pathtrace_tpu.cli import main

spp = sys.argv[1] if len(sys.argv) > 1 else "128"
sys.exit(main([
    "render", "--scene", "mesh", "--width", "1920", "--height", "1080",
    "--spp", spp, "--max-bounces", "8", "--engine", "pool",
    "--progressive", "8", "--checkpoint", "mesh_1080p.npz", "--resume",
    "--out", "mesh_1080p.png",
]))
