"""Reproduce the reference's full default render: Cornell box, 400x400,
3000 spp, MIS (world.rs:16-18), writing the PNG and the luminance.csv parity
artifact (main.rs:62-67).

Usage: python examples/render_cornell.py [spp]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from pathtrace_tpu.cli import main

spp = sys.argv[1] if len(sys.argv) > 1 else "3000"
sys.exit(main([
    "render", "--scene", "cornell", "--width", "400", "--height", "400",
    "--spp", spp, "--integrator", "mis", "--engine", "pool",
    "--out", "cornell.png", "--luminance-csv", "luminance.csv",
]))
