"""Cornell-box-style scene: Lambertian + microfacet BSDFs, ceiling area
light, rendered with the MIS path tracer (BASELINE.json config 2).

Capability beyond the reference (no area lights / path tracing there);
geometry is a [-1,1]^3 box opening toward +z with a matte and a plastic
sphere inside. The camera framing accounts for this codebase's
reference-faithful telephoto projection (see core/transform.perspective).
"""
from __future__ import annotations

import numpy as np

from ..core import transform as T
from ..film.film import Film
from ..film.filters import LanczosSincFilter
from ..camera.perspective import PerspectiveCamera
from ..materials.materials import MatteMaterial, PlasticMaterial
from ..scene import Scene, SceneBuilder

_QUAD_IDX = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)


def _quad(b, verts, material, emission=None):
    b.triangle_mesh(
        T.identity(), _QUAD_IDX, np.asarray(verts, np.float32), material,
        emission=emission,
    )


def build_scene() -> Scene:
    b = SceneBuilder()
    white = b.material(MatteMaterial(Kd=(0.73, 0.73, 0.73)))
    red = b.material(MatteMaterial(Kd=(0.65, 0.05, 0.05)))
    green = b.material(MatteMaterial(Kd=(0.12, 0.45, 0.15)))
    plastic = b.material(PlasticMaterial(
        Kd=(0.1, 0.1, 0.4), Ks=(0.7, 0.7, 0.7), roughness=0.05,
    ))

    # Box walls, normals facing inward (winding chosen so the geometric
    # normal n = normalize((v1-v0) x (v2-v0)) points into the box).
    _quad(b, [[-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]], white)   # floor
    _quad(b, [[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], white)       # ceiling
    _quad(b, [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]], white)   # back
    _quad(b, [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]], red)     # left
    _quad(b, [[1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]], green)       # right

    # Ceiling light panel, slightly below the ceiling, emitting downward.
    _quad(
        b,
        [[-0.35, 0.98, -0.35], [0.35, 0.98, -0.35],
         [0.35, 0.98, 0.35], [-0.35, 0.98, 0.35]],
        white, emission=(17.0, 12.0, 8.0),
    )

    b.sphere(T.translate([-0.45, -0.65, -0.2]), 0.35, white)
    b.sphere(T.translate([0.45, -0.6, 0.25]), 0.4, plastic)
    return b.build()


def build_camera(resolution: int = 512, filename: str = "cornell.png",
                 convention: str = "reference"):
    film = Film(
        (resolution, resolution),
        filter=LanczosSincFilter((1.0, 1.0), 3.0),
        filename=filename,
    )
    # (0,0,140) -> (-1.397,-1.708,0) centers the box under the
    # reference-faithful projection quirks INCLUDING the wrong-order
    # inverse composition (core/transform.py:compose_ref) — the aim was
    # re-solved numerically through the ACTUAL ray generator (round 2)
    # after replicating that quirk shifted the effective screen window.
    return PerspectiveCamera(
        T.look_at([0.0, 0.0, 140.0], [-1.397, -1.708, 0.0], [0.0, 1.0, 0.0]),
        screen_window=((-1.0, -1.0), (1.0, 1.0)),
        lens_radius=0.0, focal_distance=1e6, fov=90.0,
        film=film, convention=convention,
    )


if __name__ == "__main__":
    from ._run import path_main

    # Capability beyond the reference (BASELINE config 2): path tracing
    # with an area light and MIS.
    path_main(__doc__, build_scene, build_camera, resolution=512, spp=4,
              depth=5, output="cornell.png")
