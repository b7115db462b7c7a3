"""trace_tpu: a TPU-native physically-based renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pxl-th/Trace.jl (CPU Julia ray tracer): wavefront integrators over SoA ray
megabatches, deterministic segment-sum film/photon accumulation, SAH BVH
(native C++ builder + on-device traversal), shard_map data parallelism
over device meshes.

Public API mirrors the reference's constructor graph (SURVEY.md §3.5):
materials -> shapes -> lights -> Scene -> Film -> Camera -> Integrator.
"""

from .scene import Scene, SceneBuilder
from .core import transform as transforms
from .film.film import Film
from .film.filters import (
    BoxFilter, GaussianFilter, LanczosSincFilter, TriangleFilter,
)
from .camera.perspective import PerspectiveCamera
from .materials.materials import (
    GlassMaterial, MatteMaterial, MetalMaterial, MirrorMaterial,
    PlasticMaterial,
)
from .materials.textures import (
    BilerpTexture, ConstantTexture, MixTexture, ScaleTexture,
    TransformMapping3D, UVMapping2D,
)
from .lights.lights import (
    area_light, distant_light, infinite_light, point_light, spot_light,
)
from .sampler.uniform import UniformSampler
from .sampler.stratified import StratifiedSampler
from .integrators.whitted import WhittedIntegrator
from .integrators.path import PathIntegrator
from .integrators.sppm import SPPMIntegrator
from .utils.stats import RenderStats

__all__ = [
    "Scene", "SceneBuilder", "transforms",
    "Film", "BoxFilter", "GaussianFilter", "LanczosSincFilter",
    "TriangleFilter", "PerspectiveCamera",
    "GlassMaterial", "MatteMaterial", "MetalMaterial", "MirrorMaterial",
    "PlasticMaterial",
    "BilerpTexture", "ConstantTexture", "MixTexture", "ScaleTexture",
    "TransformMapping3D", "UVMapping2D",
    "area_light", "distant_light", "infinite_light", "point_light",
    "spot_light",
    "UniformSampler", "StratifiedSampler",
    "WhittedIntegrator", "PathIntegrator", "SPPMIntegrator",
    "RenderStats",
]
