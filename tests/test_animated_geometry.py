"""Animated-geometry path: traced Triangles + device Morton rebuild.

render(geometry=...) must equal a from-scratch scene built with the
moved mesh — the executable-reuse path (Scene.with_geometry +
accel/morton.build_clusters_device) cannot change the image.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trace_tpu.core import transform as T
from trace_tpu.shapes import triangle as tri_mod
from trace_tpu.scene import SceneBuilder
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.lights.lights import point_light
from trace_tpu.integrators.whitted import WhittedIntegrator
from trace_tpu.sampler.uniform import UniformSampler
from trace_tpu.film.film import Film
from trace_tpu.camera.perspective import PerspectiveCamera

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only



def _mesh(n=12, seed=3):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    c[:, 2] += 4.0
    e1 = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n],
                   -1)
    return idx, verts


def _build(mesh_transform):
    idx, verts = _mesh()
    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.triangle_mesh(mesh_transform, idx, verts, mat)
    b.light(point_light(T.translate([0.0, 6.0, 0.0]),
                        (200.0, 200.0, 200.0)))
    return b.build()


def _camera(res=48):
    film = Film((res, res), filename="/tmp/anim_geom.png")
    cam = PerspectiveCamera(
        T.look_at([0.0, 0.0, 0.0], [0.0, 0.0, 4.0], [0.0, 1.0, 0.0]),
        film=film, fov=60.0, convention="pbrt",
    )
    return cam


def test_animated_geometry_matches_rebuilt_scene():
    motion = T.compose(T.translate([0.15, -0.1, 0.3]), T.rotate_y(20.0))

    # Ground truth: scene built with the mesh already moved.
    scene_moved = _build(motion)
    integ_a = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_a = np.asarray(
        integ_a.camera.film.to_image(integ_a.render(scene_moved)))

    # Animated path: base scene + traced per-frame geometry.
    scene = _build(T.identity())
    tris_moved = tri_mod.transform_triangles(
        jax.tree.map(jnp.asarray, scene.triangles_host), motion)
    integ_b = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_b = np.asarray(
        integ_b.camera.film.to_image(integ_b.render(scene,
                                                    geometry=tris_moved)))

    assert np.isfinite(img_a).all() and np.isfinite(img_b).all()
    assert img_a.max() > 0.01  # the mesh is actually in frame
    np.testing.assert_allclose(img_b, img_a, atol=2e-3)


def test_animated_geometry_sppm_matches_rebuilt_scene():
    # Config-5 workload shape: SPPM over per-frame moved geometry must
    # equal SPPM on a scene rebuilt with the moved mesh (camera AND
    # photon passes both consume the traced geometry).
    from trace_tpu.integrators.sppm import SPPMIntegrator

    motion = T.compose(T.translate([0.1, -0.05, 0.2]), T.rotate_y(15.0))

    def _sppm(camera):
        return SPPMIntegrator(camera, initial_search_radius=0.6,
                              max_depth=3, n_iterations=2,
                              photons_per_iteration=256)

    scene_moved = _build(motion)
    st_a = _sppm(_camera(24)).render(scene_moved)

    scene = _build(T.identity())
    tris_moved = tri_mod.transform_triangles(
        jax.tree.map(jnp.asarray, scene.triangles_host), motion)
    st_b = _sppm(_camera(24)).render(scene, geometry=tris_moved)

    np.testing.assert_allclose(np.asarray(st_b.ld), np.asarray(st_a.ld),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_b.tau), np.asarray(st_a.tau),
                               atol=2e-3)

    # Fused-iteration path threads the same traced geometry.
    from trace_tpu.integrators.sppm import SPPMIntegrator as S

    integ_f = S(_camera(24), initial_search_radius=0.6, max_depth=3,
                n_iterations=2, photons_per_iteration=256,
                fused_iterations=True)
    st_f = integ_f.render(scene, geometry=tris_moved)
    np.testing.assert_allclose(np.asarray(st_f.tau), np.asarray(st_b.tau),
                               atol=1e-5)


def test_geometry_transform_fused_matches_host_transform():
    # render(geometry=base, geometry_transform=xf) — the one-dispatch
    # transform+rebuild path — must match transforming the triangles
    # up front (same mat3_apply arithmetic, just fused under jit).
    motion = T.compose(T.translate([0.15, -0.1, 0.3]), T.rotate_y(20.0))
    scene = _build(T.identity())
    base = jax.tree.map(jnp.asarray, scene.triangles_host)

    integ_a = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_a = np.asarray(integ_a.camera.film.to_image(
        integ_a.render(scene,
                       geometry=tri_mod.transform_triangles(base, motion))))

    integ_b = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_b = np.asarray(integ_b.camera.film.to_image(
        integ_b.render(scene, geometry=base, geometry_transform=motion)))

    assert img_a.max() > 0.01
    np.testing.assert_allclose(img_b, img_a, atol=1e-5)

    # Frame 2 with a different Transform must not retrace the fused
    # builder (Transform is a traced (m, inv_m) pytree argument).
    from trace_tpu.integrators import common as C

    sizes_before = C._transform_and_build._cache_size()
    integ_b.render(scene, geometry=base,
                   geometry_transform=T.translate([0.0, 0.2, 0.0]))
    assert C._transform_and_build._cache_size() == sizes_before

    # SPPM threads the same fused pair through camera+photon passes.
    from trace_tpu.integrators.sppm import SPPMIntegrator

    def _sppm(camera):
        return SPPMIntegrator(camera, initial_search_radius=0.6,
                              max_depth=3, n_iterations=2,
                              photons_per_iteration=256)

    st_a = _sppm(_camera(24)).render(
        scene, geometry=tri_mod.transform_triangles(base, motion))
    st_b = _sppm(_camera(24)).render(scene, geometry=base,
                                     geometry_transform=motion)
    np.testing.assert_allclose(np.asarray(st_b.tau), np.asarray(st_a.tau),
                               atol=1e-5)


def test_render_frames_batch_matches_sequential():
    # render_frames: K frames (per-frame lights + per-frame rigid motion)
    # in ONE dispatch must equal K sequential render() calls with the
    # lights swapped and the geometry transformed per frame.
    from trace_tpu.integrators.sppm import SPPMIntegrator
    from trace_tpu.lights import lights as light_mod

    scene = _build(T.identity())
    base = jax.tree.map(jnp.asarray, scene.triangles_host)

    def entries(k):
        return [point_light(T.translate([0.0, 6.0 + 0.5 * k, 0.3 * k]),
                            (200.0 + 30.0 * k,) * 3)]

    xfs = [T.translate([0.05 * k, 0.0, 0.1 * k]) for k in range(2)]

    integ = SPPMIntegrator(_camera(24), initial_search_radius=0.6,
                           max_depth=3, n_iterations=2,
                           photons_per_iteration=256)
    states = integ.render_frames(scene, [entries(0), entries(1)],
                                 geometry=base, frame_transforms=xfs)

    center = (scene.world_lo + scene.world_hi) / 2
    radius = float(np.linalg.norm(scene.world_hi - center))
    for k in range(2):
        lights = light_mod.preprocess(
            light_mod.pack_lights(entries(k), scene.triangles_host),
            center, radius)
        scene.lights = lights
        st = integ.render(scene, n_iterations=2, geometry=base,
                          geometry_transform=xfs[k])
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[k], states).tau),
            np.asarray(st.tau), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[k], states).ld),
            np.asarray(st.ld), atol=1e-5)


def test_render_animation_batch_mode_matches_sequential(monkeypatch, tmp_path):
    # caustic_moving.render_animation(batch_frames=K) must produce the
    # same frames as the sequential loop (scene swapped for a tiny one).
    from trace_tpu.models import caustic_moving as cm

    monkeypatch.setattr(cm, "build_scene",
                        lambda ply_path=None: _build(T.identity()))
    monkeypatch.setattr(cm, "build_camera",
                        lambda res, fn: _camera(16))
    monkeypatch.setattr(
        cm, "frame_lights",
        lambda s: [point_light(T.translate([0.3 * s, 6.0 + s, 0.0]),
                               (200.0 + 50.0 * s,) * 3)])

    def run(tag, **kw):
        return list(cm.render_animation(
            resolution=16, frames=[0.0, 1.0, 2.0], iterations=2,
            photons_per_iteration=256, max_depth=2,
            out_pattern=str(tmp_path / (tag + "-f{i}.png")),
            initial_search_radius=0.6, **kw))

    seq = run("seq")
    bat = run("bat", batch_frames=2)  # chunks of 2+1

    assert [i for i, _ in bat] == [1, 2, 3]
    for (_, a), (_, b) in zip(seq, bat):
        np.testing.assert_allclose(np.asarray(b.ld), np.asarray(a.ld),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.tau), np.asarray(a.tau),
                                   atol=1e-5)
    assert max(float(np.abs(np.asarray(a.ld)).max()) for _, a in seq) > 0


def test_geometry_accel_prebuilt_tables_match_plain_render():
    # render(geometry=..., geometry_accel=...) — the huge-static-scene
    # route (bench config 4b, >10M tris): a PRE-BUILT ClusterAccel rides
    # in as traced arguments instead of jit-embedded constants. Must
    # equal the plain render, including with a super-clustered table and
    # the scene-pinned ray_chunk knob.
    import pytest

    from trace_tpu.accel.clusters import build_clusters

    scene = _build(T.identity())
    tris = jax.tree.map(jnp.asarray, scene.triangles_host)

    integ_a = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_a = np.asarray(
        integ_a.camera.film.to_image(integ_a.render(scene)))

    acc = build_clusters(scene.triangles_host, leaf_tris=8, super_size=4)
    scene.anim_ray_chunk = 512
    scene.bump_version()
    integ_b = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_b = np.asarray(integ_b.camera.film.to_image(
        integ_b.render(scene, geometry=tris, geometry_accel=acc)))

    assert img_a.max() > 0.01
    np.testing.assert_allclose(img_b, img_a, atol=2e-3)

    # Composing with geometry_transform is rejected (a pre-built table
    # would be stale for transformed vertices).
    with pytest.raises(ValueError):
        integ_b.render(scene, geometry=tris, geometry_accel=acc,
                       geometry_transform=T.translate([0.1, 0.0, 0.0]))


def test_animated_geometry_second_frame_no_retrace():
    # Frame 2 with different vertices must NOT re-trace _chunk_pass
    # (the whole point: per-frame cost is a device rebuild, not a
    # recompile).
    scene = _build(T.identity())
    integ = WhittedIntegrator(_camera(32), UniformSampler(1, seed=0),
                              max_depth=2)
    base = jax.tree.map(jnp.asarray, scene.triangles_host)

    from trace_tpu.integrators.base import SamplerIntegrator

    f1 = tri_mod.transform_triangles(base, T.translate([0.0, 0.05, 0.0]))
    integ.render(scene, geometry=f1)
    sizes_before = SamplerIntegrator._chunk_pass._cache_size()

    f2 = tri_mod.transform_triangles(base, T.translate([0.0, 0.10, 0.0]))
    integ.render(scene, geometry=f2)
    assert SamplerIntegrator._chunk_pass._cache_size() == sizes_before


def test_animated_geometry_mirror_transform_flips_orientation():
    # A handedness-swapping frame transform (det < 0) must re-establish
    # pack_triangle_mesh's flip invariant: transform_triangles XORs the
    # determinant sign into flip_normal, so the animated path still
    # matches a scene packed with the mirrored object_to_world.
    mirror = T.compose(T.translate([0.2, 0.0, 0.0]), T.scale(-1.0, 1.0, 1.0))

    scene_moved = _build(mirror)
    integ_a = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_a = np.asarray(
        integ_a.camera.film.to_image(integ_a.render(scene_moved)))

    scene = _build(T.identity())
    base = jax.tree.map(jnp.asarray, scene.triangles_host)
    tris_m = tri_mod.transform_triangles(base, mirror)
    np.testing.assert_array_equal(
        np.asarray(tris_m.flip_normal),
        ~np.asarray(scene.triangles_host.flip_normal),
    )
    integ_b = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_b = np.asarray(
        integ_b.camera.film.to_image(integ_b.render(scene,
                                                    geometry=tris_m)))
    assert img_a.max() > 0.01
    np.testing.assert_allclose(img_b, img_a, atol=2e-3)


def test_geometry_accel_sweep_tables_match_plain_render():
    # The >10M-triangle fast path (bench config 4b headline leg): traced
    # SweepTables / PallasSweepAccelerator.from_tables threaded through
    # render(geometry=..., geometry_accel=...)
    # (integrators/common.py prepare_geometry -> apply_geometry). On CPU
    # the kernel runs in Pallas interpret mode; the image must equal the
    # plain render, and the two spellings (a PallasSweepAccelerator vs
    # its raw SweepTables) must be bit-identical to each other.
    from trace_tpu.accel.clusters import build_clusters
    from trace_tpu.ops.sweep_pallas import (PallasSweepAccelerator,
                                            SweepTables)

    scene = _build(T.identity())
    tris = jax.tree.map(jnp.asarray, scene.triangles_host)

    integ_a = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_a = np.asarray(
        integ_a.camera.film.to_image(integ_a.render(scene)))
    assert img_a.max() > 0.01

    acc = build_clusters(scene.triangles_host, leaf_tris=8, super_size=4)
    sweep = PallasSweepAccelerator(acc, group=4, block_rays=128,
                                   ray_chunk=512, interpret=True)
    scene.anim_block_rays = 128
    scene.anim_ray_chunk = 512
    scene.bump_version()

    def run(accel):
        integ = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                  max_depth=3)
        return np.asarray(integ.camera.film.to_image(
            integ.render(scene, geometry=tris, geometry_accel=accel)))

    img_sweep = run(sweep)
    np.testing.assert_allclose(img_sweep, img_a, atol=2e-3)

    # Raw SweepTables spelling — what bench 4b actually passes — must be
    # bit-identical to the accelerator spelling (same tables, same knobs).
    img_tables = run(sweep.tables)
    np.testing.assert_array_equal(img_tables, img_sweep)

    # Composes with exact_shared_edges: apply_geometry forwards the
    # scene's exact_edges into from_tables(certified=True) — the widened
    # epilogue may only fatten silhouettes by certified ulp-scale radii,
    # so the image stays within plain-render tolerance.
    scene.exact_edges = True
    scene.bump_version()
    img_cert = run(sweep.tables)
    scene.exact_edges = False
    scene.bump_version()
    np.testing.assert_allclose(img_cert, img_a, atol=2e-3)

    # Refit composition: refit the accelerator for moved vertices, thread
    # the refreshed tables with the moved triangles — must equal a scene
    # rebuilt with the moved mesh.
    motion = T.translate([0.1, -0.05, 0.2])
    tris_m = tri_mod.transform_triangles(tris, motion)
    sweep.refit(tris_m.v0, tris_m.v1, tris_m.v2)
    scene.bump_version()
    integ_r = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_refit = np.asarray(integ_r.camera.film.to_image(
        integ_r.render(scene, geometry=tris_m,
                       geometry_accel=sweep.tables)))

    scene_moved = _build(motion)
    integ_m = WhittedIntegrator(_camera(), UniformSampler(1, seed=0),
                                max_depth=3)
    img_m = np.asarray(
        integ_m.camera.film.to_image(integ_m.render(scene_moved)))
    assert img_m.max() > 0.01
    np.testing.assert_allclose(img_refit, img_m, atol=2e-3)
