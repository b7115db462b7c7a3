"""Animated caustic scene: the caustic-glass geometry with a rising spot
light + fill point light, one SPPM run per frame.

TPU-native counterpart of /root/reference/docs/code/caustic_moving.jl —
same shift schedule (0:0.1:5), light colors/intensities, radius 0.055,
25 iterations and 1.25M photons per frame. Geometry is static across
frames (only the light moves), so the scene is built once and the BVH is
reused; ``render_animation`` also exercises the per-frame BVH refit path
for parity with BASELINE.json config 5.
"""
from __future__ import annotations

import numpy as np

from ..core import transform as T
from ..integrators.sppm import SPPMIntegrator
from ..lights.lights import pack_lights, point_light, spot_light
from ..lights import lights as light_mod
from ..scene import Scene
from .caustic_glass import PLY_PATH, build_camera, build_scene

SHIFTS = np.arange(0.0, 5.0 + 1e-6, 0.1, dtype=np.float32)


def _spot_l2w(frm):
    """Spot light-to-world: aim from ``frm`` toward the caustic target,
    then apply the scene shift (caustic_moving.jl:60-71)."""
    to = np.array([-5.0, 0.0, 5.0], np.float32)
    return T.compose(
        T.compose(T.translate([4.5, 0.0, -101.0]), T.translate(frm)),
        T.inverse(T.dir_to_z(to - frm)),
    )


def frame_lights(shift: float):
    """Light list for one animation frame (caustic_moving.jl:60-89)."""
    frm = np.array([0.0, 0.5 + shift, 0.0], np.float32)
    spot_color = tuple(60.0 * np.array([0.988235, 0.972549, 0.57647]))
    return [
        point_light(T.translate([2.5, 10.0, -100.0]), (20.0, 20.0, 20.0)),
        spot_light(_spot_l2w(frm), spot_color, 30.0, 30.0 - 10.0),
    ]


def set_frame_lights(scene: Scene, shift: float) -> Scene:
    """Swap the scene's light table for the frame's lights; geometry and
    BVH stay untouched (the reference rebuilds the Scene per frame,
    caustic_moving.jl:90)."""
    lights = pack_lights(
        frame_lights(shift), getattr(scene, "triangles_host", scene.triangles)
    )
    center = (scene.world_lo + scene.world_hi) / 2
    radius = float(np.linalg.norm(scene.world_hi - center))
    scene.lights = light_mod.preprocess(lights, center, radius)
    scene.max_area_tris = 0
    # No bump_version: integrators thread the light table in as a traced
    # jit argument (Scene.with_lights), so a relight reuses the compiled
    # passes — the point of swapping lights instead of rebuilding.
    return scene


def render_animation(
    resolution: int = 256, frames=None, iterations: int = 25,
    photons_per_iteration: int = 1_250_000, max_depth: int = 5,
    out_pattern: str = "caustic-moving-{i}.png", ply_path: str = PLY_PATH,
    refit_each_frame: bool = False, motion=None, batch_frames: int = 0,
    **integ_kw,
):
    """Render the animation; yields (frame_index, SPPMState).

    ``motion`` (optional): a callable shift -> core.transform.Transform
    giving the glass mesh's rigid motion for the frame. Frames then go
    through the fused animated-geometry path (render(geometry=base,
    geometry_transform=xf)): one dispatch transforms the device-resident
    mesh AND re-clusters it, with no recompiles — strictly faster than
    ``refit_each_frame`` (which re-traces because geometry is
    closure-baked in the static path).

    ``batch_frames=K`` (optional): run the frame loop itself on device —
    chunks of K frames via SPPMIntegrator.render_frames (lights and
    motion included; dispatches capped at fused_block iteration bodies).
    Incompatible with ``refit_each_frame``."""
    import jax
    import jax.numpy as jnp

    scene = build_scene(ply_path)
    base_tris = (
        jax.tree.map(jnp.asarray, scene.triangles_host)
        if motion is not None else None
    )
    frames = SHIFTS if frames is None else frames
    # One camera + integrator reused across frames: the jitted passes are
    # compiled once (lights enter as traced arguments), so frame 2+ pays
    # render time only — the reference rebuilds the whole Scene per frame
    # (caustic_moving.jl:90).
    camera = build_camera(resolution, out_pattern.format(i=1))
    integ = SPPMIntegrator(
        camera,
        initial_search_radius=integ_kw.pop("initial_search_radius", 0.055),
        max_depth=max_depth,
        n_iterations=iterations,
        photons_per_iteration=photons_per_iteration, **integ_kw,
    )
    # Frame PNGs are flushed AFTER the frame loop: any device->host
    # readback mid-run permanently degrades the TPU relay dispatch
    # latency (~100x), so saving each frame as it finishes would slow
    # every later frame. Device images are cheap to hold (12 MB each at
    # 1024^2).
    pending = []
    if batch_frames > 0:
        assert not refit_each_frame, \
            "batch_frames runs the frame loop on device; host refit " \
            "cannot interleave"
        try:
            shifts = [float(s) for s in frames]
            for c0 in range(0, len(shifts), batch_frames):
                chunk = shifts[c0:c0 + batch_frames]
                states = integ.render_frames(
                    scene, [frame_lights(s) for s in chunk],
                    n_iterations=iterations,
                    geometry=base_tris,
                    frame_transforms=(
                        [motion(s) for s in chunk]
                        if motion is not None else None),
                )
                for k in range(len(chunk)):
                    i = c0 + k + 1
                    state = jax.tree.map(lambda x: x[k], states)
                    pending.append((out_pattern.format(i=i),
                                    integ.to_image(state, iterations)))
                    yield i, state
        finally:
            film = camera.film
            for path, img in pending:
                film.save_png(film.set_image(img), path)
        return
    try:
        for i, shift in enumerate(frames, start=1):
            scene = set_frame_lights(scene, float(shift))
            if refit_each_frame and scene.accel is not None:
                scene.accel.refit(
                    scene.triangles.v0, scene.triangles.v1,
                    scene.triangles.v2,
                )
                scene.bump_version()  # geometry is closure-baked: re-trace
            if motion is not None:
                state = integ.render(scene, geometry=base_tris,
                                      geometry_transform=motion(shift))
            else:
                state = integ.render(scene)
            pending.append(
                (out_pattern.format(i=i), integ.to_image(state, iterations))
            )
            yield i, state
    finally:
        film = camera.film
        for path, img in pending:
            film.save_png(film.set_image(img), path)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--iterations", type=int, default=25)
    ap.add_argument("--frames", type=int, default=len(SHIFTS))
    ap.add_argument("--photons", type=int, default=1_250_000)
    a = ap.parse_args()
    # Reference animation: 25 iters/frame, depth 5, 1.25M photons/iter
    # (caustic_moving.jl:49-100).
    for i, _state in render_animation(
        resolution=a.resolution, frames=SHIFTS[: a.frames],
        iterations=a.iterations, photons_per_iteration=a.photons,
    ):
        print(f"frame {i}/{a.frames}")
