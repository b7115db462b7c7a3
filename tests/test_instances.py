"""Instanced (two-level) geometry vs flattened-equivalent scenes.

The reference composes BVHs as primitives (nested BVH,
/root/reference/src/accel/bvh.jl:50-68, test_intersection.jl:129-156);
trace_tpu's counterpart is the instance sweep (accel/instances.py). These
tests assert the instanced path is geometrically equivalent to baking the
transforms into the vertices, without the memory blowup."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.core import transform as T
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.scene import SceneBuilder

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


F32 = jnp.float32


def _tetra():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    idx = np.array(
        [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.uint32
    )
    return idx, verts


def _grid_mesh(n=9):
    """(n-1)^2 * 2 triangles in the z=0 plane — big enough to trip the
    base-mesh cluster accel (>64 tris for n=9: 128 tris)."""
    xs = np.linspace(0.0, 1.0, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.1 * np.sin(6.0 * gx) * np.cos(5.0 * gy)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    v00 = (ii * n + jj).reshape(-1)
    tris = np.concatenate(
        [np.stack([v00, v00 + n, v00 + 1], -1),
         np.stack([v00 + 1, v00 + n, v00 + n + 1], -1)], axis=0
    ).astype(np.uint32)
    return tris, verts


def _transforms():
    return [
        T.translate([0.0, 0.0, -3.0]),
        T.compose(T.translate([2.0, 0.5, -4.0]), T.rotate_y(40.0)),
        T.compose(T.translate([-2.0, -0.5, -5.0]),
                  T.compose(T.rotate_x(25.0), T.scale(1.5, 0.8, 1.2))),
        T.compose(T.translate([0.5, 2.0, -6.0]), T.rotate_z(70.0)),
    ]


def _bake(idx, verts, t):
    m = np.asarray(t.m, np.float32)
    return idx, verts @ m[:3, :3].T + m[:3, 3]


def _build_pair(idx, verts):
    """(instanced scene, flattened scene) with identical content."""
    trs = _transforms()

    bi = SceneBuilder()
    mat = bi.material(MatteMaterial(Kd=(0.7, 0.6, 0.5)))
    bi.instanced_mesh(idx, verts, trs, mat)
    bi.light(L.point_light(T.translate([0.0, 5.0, 0.0]), (50.0, 50.0, 50.0)))
    inst = bi.build()

    bf = SceneBuilder()
    mat = bf.material(MatteMaterial(Kd=(0.7, 0.6, 0.5)))
    for t in trs:
        bf.triangle_mesh(t, idx, verts, mat)
    bf.light(L.point_light(T.translate([0.0, 5.0, 0.0]), (50.0, 50.0, 50.0)))
    flat = bf.build(use_bvh=False)
    return inst, flat


def _probe_rays(n=512, seed=0):
    rng = np.random.default_rng(seed)
    o = np.array([0.0, 0.3, 4.0], np.float32) + 0.3 * rng.normal(
        size=(n, 3)
    ).astype(np.float32)
    targets = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-1.5, 2.5, n),
        rng.uniform(-6.5, -2.5, n),
    ], -1).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("mesh", ["tetra", "grid"])
def test_instanced_matches_flattened_closest(mesh):
    idx, verts = _tetra() if mesh == "tetra" else _grid_mesh()
    inst, flat = _build_pair(idx, verts)
    if mesh == "grid":
        assert inst.instanced[0].accel is not None  # cluster inner path
    o, d = _probe_rays()
    tm = jnp.full((o.shape[0],), jnp.inf, F32)

    hi = jax.jit(lambda o, d, tm: inst.intersect(o, d, tm))(o, d, tm)
    hf = jax.jit(lambda o, d, tm: flat.intersect(o, d, tm))(o, d, tm)

    vi, vf = np.asarray(hi.valid), np.asarray(hf.valid)
    # Hit/miss agreement (grazing f32 differences allowed on <1% of rays).
    assert np.mean(vi != vf) < 0.01
    both = vi & vf
    assert both.sum() > 50  # the probe actually hits instances
    np.testing.assert_allclose(
        np.asarray(hi.t)[both], np.asarray(hf.t)[both], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(hi.p)[both], np.asarray(hf.p)[both], atol=2e-3
    )
    # Shading normals agree up to f32 transform noise.
    dot = np.sum(np.asarray(hi.ns)[both] * np.asarray(hf.ns)[both], axis=-1)
    assert dot.min() > 0.999


def test_instanced_occlusion_matches_flattened():
    idx, verts = _tetra()
    inst, flat = _build_pair(idx, verts)
    o, d = _probe_rays(seed=3)
    tm = jnp.full((o.shape[0],), 8.0, F32)
    oi = np.asarray(jax.jit(lambda: inst.intersect_p(o, d, tm))())
    of = np.asarray(jax.jit(lambda: flat.intersect_p(o, d, tm))())
    assert np.mean(oi != of) < 0.01


@pytest.mark.parametrize("with_normals", [False, True])
def test_mirrored_instance_normals(with_normals):
    # A handedness-swapping instance must present the same normals as its
    # baked-mirror flattening — both for cross-product geometric normals
    # (det sign cancels the reference's winding flip) and for per-vertex
    # shading normals (flipped on swap, surface_interaction.jl:70-88).
    idx, verts = _tetra()
    centroid = verts.mean(axis=0)
    vnorms = (verts - centroid)
    vnorms /= np.linalg.norm(vnorms, axis=-1, keepdims=True)
    normals = vnorms.astype(np.float32) if with_normals else None
    mir = T.compose(T.translate([0.0, 0.0, -3.0]), T.scale(-1.0, 1.0, 1.0))

    bi = SceneBuilder()
    mat = bi.material(MatteMaterial())
    bi.instanced_mesh(idx, verts, [mir], mat, normals=normals)
    inst = bi.build()

    bf = SceneBuilder()
    mat = bf.material(MatteMaterial())
    bf.triangle_mesh(mir, idx, verts, mat, normals=normals)
    flat = bf.build(use_bvh=False)

    o, d = _probe_rays(seed=5)
    tm = jnp.full((o.shape[0],), jnp.inf, F32)
    hi = jax.jit(lambda: inst.intersect(o, d, tm))()
    hf = jax.jit(lambda: flat.intersect(o, d, tm))()
    both = np.asarray(hi.valid) & np.asarray(hf.valid)
    assert both.sum() > 20
    dot = np.sum(np.asarray(hi.ns)[both] * np.asarray(hf.ns)[both], axis=-1)
    assert dot.min() > 0.999


def test_instanced_render_matches_flattened():
    # End-to-end: a Whitted render of 4 instanced tetrahedra equals the
    # flattened render (same camera/light/material).
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    idx, verts = _tetra()
    inst, flat = _build_pair(idx, verts)

    def render(scene):
        film = Film((24, 24), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                    filename="/tmp/_inst.png")
        cam = PerspectiveCamera(
            T.look_at([0.0, 0.3, 4.0], [0.0, 0.0, -4.0], [0.0, 1.0, 0.0]),
            film=film, convention="pbrt",
        )
        st = WhittedIntegrator(cam, UniformSampler(1, seed=2),
                               max_depth=2).render(scene)
        return np.asarray(film.to_image(st))

    img_i = render(inst)
    img_f = render(flat)
    assert np.isfinite(img_i).all()
    assert img_i.max() > 0.01
    mse = float(np.mean((img_i - img_f) ** 2))
    assert mse < 1e-6, mse


def test_instance_memory_is_shared():
    # 100 instances must NOT multiply geometry memory: the scene holds one
    # base mesh + a [100, 4, 4] transform table.
    idx, verts = _grid_mesh()
    trs = [T.translate([3.0 * i, 0.0, -5.0]) for i in range(100)]
    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.instanced_mesh(idx, verts, trs, mat)
    scene = b.build()
    geom = scene.instanced[0]
    assert geom.n_instances == 100
    n_base = geom.n_base
    assert np.asarray(geom.base.v0).shape[0] == n_base  # stored once
    assert np.asarray(geom.table.o2w).shape == (100, 4, 4)
    assert scene.n_triangles == 0  # nothing flattened


def test_instanced_geometry_in_sppm():
    # Instanced geometry must work through the photon integrator's
    # intersect/any-hit paths (scene.intersect is shared by all
    # integrators; this exercises the instance sweep inside the SPPM
    # camera + photon walks end-to-end).
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.integrators.sppm import SPPMIntegrator

    idx, verts = _tetra()
    b = SceneBuilder()
    mat = b.material(MatteMaterial(Kd=(0.7, 0.7, 0.7)))
    b.instanced_mesh(idx, verts, _transforms(), mat)
    b.light(L.point_light(T.translate([0.0, 5.0, -2.0]), (60.0, 60.0, 60.0)))
    scene = b.build()

    film = Film((16, 16), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                filename="/tmp/_inst_sppm.png")
    cam = PerspectiveCamera(
        T.look_at([0.0, 0.3, 4.0], [0.0, 0.0, -4.0], [0.0, 1.0, 0.0]),
        film=film, convention="pbrt",
    )
    integ = SPPMIntegrator(cam, initial_search_radius=0.3, max_depth=2,
                           n_iterations=2, photons_per_iteration=512)
    st = integ.render(scene)
    img = np.asarray(integ.to_image(st, 2))
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # instanced surfaces receive light


def _sphere_instance_pair(n_side=5, clipped=True):
    """(instanced scene, flattened scene): n_side^2 copies of one (clipped)
    sphere on a grid. Flattening composes each instance transform into the
    sphere's own object_to_world — the exact equivalence oracle."""
    base_xf = T.compose(T.rotate_x(30.0), T.scale(1.0, 1.0, 1.3))
    entry = dict(object_to_world=base_xf, radius=0.6, material_id=0)
    if clipped:
        entry.update(z_min=-0.45, z_max=0.5, phi_max=300.0)
    trs = [
        T.translate([1.6 * i - 0.8 * n_side, 0.9 * j - 0.45 * n_side, -6.0])
        for i in range(n_side) for j in range(n_side)
    ]

    bi = SceneBuilder()
    mat = bi.material(MatteMaterial(Kd=(0.6, 0.5, 0.4)))
    bi.instanced_spheres([dict(entry, material_id=mat)], trs)
    bi.light(L.point_light(T.translate([0.0, 6.0, 2.0]), (80.0,) * 3))
    inst = bi.build()

    bf = SceneBuilder()
    mat = bf.material(MatteMaterial(Kd=(0.6, 0.5, 0.4)))
    for t in trs:
        bf.sphere(T.compose(t, base_xf), entry["radius"], mat,
                  **{k: v for k, v in entry.items()
                     if k in ("z_min", "z_max", "phi_max")})
    bf.light(L.point_light(T.translate([0.0, 6.0, 2.0]), (80.0,) * 3))
    flat = bf.build(use_bvh=False)
    return inst, flat


def test_sphere_field_scene_renders():
    # The runnable instanced-sphere-array exhibit (1024 copies of one
    # clipped sphere, models/sphere_field.py): builds, renders finite,
    # and actually shows spheres (nested-BVH generality end-to-end).
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.models.sphere_field import build_scene, build_camera
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene(n=6)  # 36 instances: CPU-suite sized
    assert scene.instanced, "instanced sphere table missing"
    cam = build_camera(resolution=32, filename="/tmp/sphere_field.png")
    integ = WhittedIntegrator(cam, UniformSampler(1, seed=0), max_depth=2)
    img = np.asarray(cam.film.to_image(integ.render(scene)))
    assert np.isfinite(img).all()
    assert img.max() > 0.02
    assert img.std() > 1e-3  # not a flat frame: geometry is in view


@pytest.mark.parametrize("clipped", [False, True])
def test_instanced_spheres_match_flattened(clipped):
    inst, flat = _sphere_instance_pair(clipped=clipped)
    rng = np.random.default_rng(11)
    n = 768
    o = np.array([0.0, 0.5, 4.0], np.float32) + 0.4 * rng.normal(
        size=(n, 3)
    ).astype(np.float32)
    targets = np.stack([
        rng.uniform(-4.5, 4.5, n), rng.uniform(-3.0, 3.0, n),
        np.full(n, -6.0),
    ], -1).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), jnp.inf, F32)

    hi = jax.jit(lambda o, d, tm: inst.intersect(o, d, tm))(o, d, tm)
    hf = jax.jit(lambda o, d, tm: flat.intersect(o, d, tm))(o, d, tm)
    vi, vf = np.asarray(hi.valid), np.asarray(hf.valid)
    assert np.mean(vi != vf) < 0.01  # grazing f32 disagreements only
    both = vi & vf
    assert both.sum() > 100
    np.testing.assert_allclose(
        np.asarray(hi.t)[both], np.asarray(hf.t)[both], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(hi.p)[both], np.asarray(hf.p)[both], atol=2e-3
    )
    dot = np.sum(np.asarray(hi.ns)[both] * np.asarray(hf.ns)[both], axis=-1)
    assert dot.min() > 0.999
    # uv parameterization survives the composition (clipping params live
    # in the base table, not the instance transform).
    np.testing.assert_allclose(
        np.asarray(hi.uv)[both], np.asarray(hf.uv)[both], atol=2e-3
    )
    # Occlusion path too.
    tm8 = jnp.full((n,), 12.0, F32)
    oi = np.asarray(jax.jit(lambda: inst.intersect_p(o, d, tm8))())
    of = np.asarray(jax.jit(lambda: flat.intersect_p(o, d, tm8))())
    assert np.mean(oi != of) < 0.01


def test_instanced_sphere_memory_is_shared():
    # 1000 instances of ONE clipped sphere: base table stays one row; the
    # per-instance cost is the [1000, 4, 4] transform pair.
    entry = dict(object_to_world=T.identity(), radius=0.5, material_id=0,
                 z_min=-0.3, z_max=0.4)
    trs = [T.translate([0.01 * i, 0.0, -5.0]) for i in range(1000)]
    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.instanced_spheres([dict(entry, material_id=mat)], trs)
    scene = b.build()
    geom = scene.instanced[0]
    assert geom.n_instances == 1000
    assert geom.n_base == 1
    assert np.asarray(geom.base.radius).shape == (1,)   # stored once
    assert np.asarray(geom.table.o2w).shape == (1000, 4, 4)
    assert scene.n_spheres == 0  # nothing flattened


def test_instanced_sphere_render_matches_flattened():
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    inst, flat = _sphere_instance_pair(n_side=3)

    def render(scene):
        film = Film((24, 24), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                    filename="/tmp/_inst_sph.png")
        cam = PerspectiveCamera(
            T.look_at([0.0, 0.5, 4.0], [0.0, 0.0, -6.0], [0.0, 1.0, 0.0]),
            film=film, convention="pbrt",
        )
        st = WhittedIntegrator(cam, UniformSampler(1, seed=2),
                               max_depth=2).render(scene)
        return np.asarray(film.to_image(st))

    img_i = render(inst)
    img_f = render(flat)
    assert np.isfinite(img_i).all()
    assert img_i.max() > 0.01
    mse = float(np.mean((img_i - img_f) ** 2))
    assert mse < 1e-5, mse


def test_bsdf_mis_leg_ignores_instanced_hits():
    """estimate_direct's BSDF-sampling leg must not attribute a hit on
    INSTANCED geometry to an area light: instanced prim ids (>= n_spheres
    + n_triangles) used to clip onto the last flat triangle — here the
    light panel — adding emitted radiance for an opaque blocker (light
    leak). Oracle: the identical scene with the instance baked flat."""
    from trace_tpu.integrators import common
    from trace_tpu.materials.materials import compute_scattering

    def build(baked: bool):
        b = SceneBuilder()
        matte = b.material(MatteMaterial())
        floor_v = np.array(
            [[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]],
            np.float32,
        )
        quad = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        b.triangle_mesh(T.identity(), quad, floor_v, matte)
        # Big plate 1 above the floor, off-center so plenty of cosine
        # rays from the origin hit it.
        plate_v = np.array(
            [[0.2, 1.0, -3.0], [3.0, 1.0, -3.0], [3.0, 1.0, 3.0],
             [0.2, 1.0, 3.0]], np.float32,
        )
        if baked:
            b.triangle_mesh(T.identity(), quad, plate_v, matte)
        # Area light panel LAST in the flat table (its tri_light_id slots
        # are the final flat entries the bug clipped onto).
        light_v = np.array(
            [[-2, 6, -2], [2, 6, -2], [2, 6, 2], [-2, 6, 2]], np.float32
        )
        b.triangle_mesh(T.identity(), quad, light_v, matte,
                        emission=(8.0, 8.0, 8.0))
        if not baked:
            b.instanced_mesh(quad, plate_v, [T.identity(), T.translate([7.0, 0.0, 0.0])], matte)
        return b.build()

    s_inst = build(baked=False)
    s_flat = build(baked=True)
    assert s_inst.instanced and not s_flat.instanced

    n = 256
    # Shade points on the floor around the origin.
    px = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    o = jnp.stack([jnp.asarray(px), jnp.full(n, 3.0), jnp.zeros(n)], -1)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], F32), (n, 1))
    hit = s_inst.intersect(o, d, jnp.full(n, jnp.inf, F32))
    assert bool(hit.valid.all())
    lobes = compute_scattering(s_inst.materials, hit)

    key = jax.random.key(5)
    u_l = jax.random.uniform(jax.random.fold_in(key, 0), (n, 2), F32)
    u_s = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2), F32)
    idx = jnp.zeros(n, jnp.int32)
    ld_i = np.asarray(common.estimate_direct(s_inst, hit, lobes, idx, u_l, u_s))
    ld_f = np.asarray(common.estimate_direct(s_flat, hit, lobes, idx, u_l, u_s))
    assert np.isfinite(ld_i).all()
    # Identical geometry, identical samples -> identical estimate. The
    # clip bug inflates ld_i on every lane whose BSDF ray hits the plate.
    np.testing.assert_allclose(ld_i, ld_f, atol=1e-5)
