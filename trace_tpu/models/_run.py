"""Scene-script entry points.

``python -m trace_tpu.models.<scene> [--resolution ...]`` is the
counterpart of running the reference's scene scripts
(``julia -t 4 --project=. scenes/caustic_glass.jl``, README.md:26):
layer 14 of SURVEY.md §1 — a "scene" is runnable code, not a config
file. Each model module passes its reference-faithful defaults here and
exposes the same handful of knobs the Julia scripts hard-code.
"""
from __future__ import annotations

import argparse


def _parser(doc, resolution, output):
    ap = argparse.ArgumentParser(description=doc)
    ap.add_argument("--resolution", type=int, default=resolution)
    ap.add_argument("--output", default=output)
    return ap


def sppm_main(doc, build_scene, build_camera, *, resolution, iterations,
              radius, depth, photons=-1, output="render.png"):
    """SPPM scene script (sppm.jl:108-130 constructor surface)."""
    ap = _parser(doc, resolution, output)
    ap.add_argument("--iterations", type=int, default=iterations)
    ap.add_argument("--depth", type=int, default=depth)
    ap.add_argument("--photons", type=int, default=photons,
                    help="photons per iteration; -1 = one per pixel")
    a = ap.parse_args()
    from ..integrators.sppm import SPPMIntegrator

    scene = build_scene()
    cam = build_camera(a.resolution, a.output)
    integ = SPPMIntegrator(
        cam, initial_search_radius=radius, max_depth=a.depth,
        n_iterations=a.iterations, photons_per_iteration=a.photons,
    )
    state = integ.render(scene)
    cam.film.save_png(
        cam.film.set_image(integ.to_image(state, a.iterations)), a.output
    )
    print(f"wrote {a.output}")


def whitted_main(doc, build_scene, build_camera, *, resolution, spp=4,
                 depth=5, output="render.png"):
    ap = _parser(doc, resolution, output)
    ap.add_argument("--spp", type=int, default=spp)
    ap.add_argument("--depth", type=int, default=depth)
    a = ap.parse_args()
    from ..integrators.whitted import WhittedIntegrator
    from ..sampler.uniform import UniformSampler

    scene = build_scene()
    cam = build_camera(a.resolution, a.output)
    integ = WhittedIntegrator(cam, UniformSampler(a.spp), max_depth=a.depth)
    state = integ.render(scene)
    cam.film.save_png(state, a.output)
    print(f"wrote {a.output}")


def path_main(doc, build_scene, build_camera, *, resolution, spp=4,
              depth=5, output="render.png"):
    ap = _parser(doc, resolution, output)
    ap.add_argument("--spp", type=int, default=spp)
    ap.add_argument("--depth", type=int, default=depth)
    a = ap.parse_args()
    from ..integrators.path import PathIntegrator
    from ..sampler.uniform import UniformSampler

    scene = build_scene()
    cam = build_camera(a.resolution, a.output)
    integ = PathIntegrator(cam, UniformSampler(a.spp), max_depth=a.depth)
    state = integ.render(scene)
    cam.film.save_png(state, a.output)
    print(f"wrote {a.output}")
