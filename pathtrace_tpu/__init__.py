"""pathtrace_tpu — a TPU-native wavefront Monte-Carlo path-tracing framework.

Built in JAX/XLA/Pallas with the capabilities of the Rust CPU reference
renderer (roxas1533/pathtrace): Lambertian / Oren-Nayar diffuse, GGX
metal/dielectric microfacet BSDF with VNDF sampling, emissive area lights,
and three integrators (BRDF-only, NEE, MIS) — redesigned as a wavefront
renderer over SoA ray batches with counter-based RNG and pixel-tile data
parallelism across TPU meshes.
"""

from .integrators import trace_wave
from .models.camera import Camera
from .models.materials import Emissive, Lambertian, Mirror, OrenNayar, PBRMaterial
from .models.scene import Scene, SceneBuilder
from .render import RenderConfig, RenderState, render, to_srgb_u8

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Emissive",
    "Lambertian",
    "Mirror",
    "OrenNayar",
    "PBRMaterial",
    "RenderConfig",
    "RenderState",
    "Scene",
    "SceneBuilder",
    "render",
    "to_srgb_u8",
    "trace_wave",
]
