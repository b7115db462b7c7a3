"""The reference's caustic-glass scene: a glass PLY mesh over a plastic
floor, lit by a spot light, rendered with SPPM.

TPU-native counterpart of /root/reference/docs/code/caustic_glass.jl —
same materials, transforms, light and camera parameters. The mesh loads
through trace_tpu.io.ply (the reference's Assimp path is disabled in its
module; the asset ships in its docs).
"""
from __future__ import annotations

import numpy as np

from ..core import transform as T
from ..film.film import Film
from ..film.filters import LanczosSincFilter
from ..camera.perspective import PerspectiveCamera
from ..io.ply import load_ply
from ..lights.lights import spot_light
from ..materials.materials import GlassMaterial, PlasticMaterial
from ..scene import Scene, SceneBuilder

PLY_PATH = "/root/reference/docs/src/assets/models/caustic-glass.ply"


def build_scene(ply_path: str = PLY_PATH) -> Scene:
    b = SceneBuilder()
    glass = b.material(GlassMaterial(
        Kr=(1.0, 1.0, 1.0), Kt=(1.0, 1.0, 1.0),
        u_roughness=0.0, v_roughness=0.0, index=1.25, remap_roughness=True,
    ))
    plastic = b.material(PlasticMaterial(
        Kd=(0.6399999857,) * 3, Ks=(0.1000000015,) * 3,
        roughness=0.010408001, remap_roughness=True,
    ))

    mesh = load_ply(ply_path)
    b.triangle_mesh(
        T.translate([5.0, -1.49, -100.0]), mesh["indices"], mesh["vertices"],
        glass, normals=mesh["normals"], uv=mesh["uv"],
    )

    # Floor (caustic_glass.jl:30-43). The reference's vertex list collapses
    # both floor triangles onto a line (duplicated vertices), so its floor
    # never renders in the current code; we use the intended 30x30 quad.
    floor_verts = np.array(
        [
            [0, 0, 0], [0, 0, -30], [30, 0, -30], [30, 0, 0],
        ],
        np.float32,
    )
    floor_idx = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)  # +y geometric n
    floor_normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    b.triangle_mesh(
        T.translate([-10.0, 0.0, -87.0]), floor_idx, floor_verts, plastic,
        normals=floor_normals,
    )

    # Spot light aimed from (0,2,0) toward (-5,0,5) in its local frame,
    # then shifted by (4.5, 0, -101) (caustic_glass.jl:49-71).
    frm = np.array([0.0, 2.0, 0.0], np.float32)
    to = np.array([-5.0, 0.0, 5.0], np.float32)
    l2w = T.compose(
        T.compose(T.translate([4.5, 0.0, -101.0]), T.translate(frm)),
        T.inverse(T.dir_to_z(to - frm)),
    )
    b.light(spot_light(l2w, (60.0, 60.0, 60.0), 30.0, 30.0 - 10.0))
    return b.build()


def build_camera(resolution: int = 256, filename: str = "caustics.png",
                 showcase: bool = False, convention: str = "reference"):
    """Faithful camera by default (caustic_glass.jl:96-99). The reference's
    screen-band quirk aims that camera slightly above the lit floor spot,
    so the caustic sits at the frame's bottom edge; ``showcase=True`` keeps
    every camera parameter but retargets so the caustic pattern and the
    glass both land mid-frame (target chosen by projecting them through
    the same quirky chain)."""
    film = Film(
        (resolution, resolution),
        filter=LanczosSincFilter((1.0, 1.0), 3.0),
        filename=filename,
    )
    # showcase: reproduces the round-1 showcase view exactly (center ray
    # matched to 6e-5 across the frame) — the aim was re-solved through
    # the actual ray generator after replicating the wrong-order inverse
    # composition shifted the effective screen window.
    # Default: the reference's literal look_point (caustic_glass.jl:79).
    target = [-3.535, -1.205, -93.0] if showcase else [-3.0, 0.0, -91.0]
    return PerspectiveCamera(
        T.look_at([0.0, 150.0, 150.0], target, [0.0, 1.0, 0.0]),
        screen_window=((-1.0, -1.0), (1.0, 1.0)),
        shutter_open=0.0, shutter_close=1.0,
        lens_radius=0.0, focal_distance=1e6, fov=90.0,
        film=film, convention=convention,
    )


if __name__ == "__main__":
    from ._run import sppm_main

    # Flagship caustic: SPPM, r0 = 0.075, ray depth 8, 100 iterations
    # (caustic_glass.jl:75-95, README.md:26-36).
    sppm_main(__doc__, build_scene, build_camera, resolution=1024,
              iterations=100, radius=0.075, depth=8,
              output="caustics.png")
