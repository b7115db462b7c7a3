"""Shape intersection tests mirroring reference test/test_intersection.jl."""
import jax.numpy as jnp
import numpy as np

from trace_tpu.core import transform as T
from trace_tpu.shapes import sphere as S
from trace_tpu.shapes import triangle as Tr


def unit_sphere(o2w=None, radius=1.0):
    return S.pack_spheres(
        [{"object_to_world": o2w or T.identity(), "radius": radius, "material_id": 0}]
    )


def rays(o, d):
    o = jnp.atleast_2d(jnp.asarray(o, jnp.float32))
    d = jnp.atleast_2d(jnp.asarray(d, jnp.float32))
    t_max = jnp.full(o.shape[:1], jnp.inf, jnp.float32)
    time = jnp.zeros(o.shape[:1], jnp.float32)
    return o, d, t_max, time


def test_sphere_frontal_hit():
    sph = unit_sphere()
    o, d, t_max, time = rays([0, 0, -3.0], [0, 0, 1.0])
    hit, t, idx = S.intersect_closest(sph, o, d, t_max)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
    h = S.make_hit(sph, o, d, time, t, idx, hit)
    np.testing.assert_allclose(h.p[0], [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(h.n[0] / np.linalg.norm(h.n[0]), [0, 0, -1], atol=1e-4)
    assert bool(S.intersect_p(sph, o, d, t_max)[0])


def test_sphere_inside_hit():
    # Ray starting inside the sphere hits the far wall (t1).
    sph = unit_sphere()
    o, d, t_max, time = rays([0, 0, 0.0], [0, 0, 1.0])
    hit, t, idx = S.intersect_closest(sph, o, d, t_max)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)


def test_sphere_miss_and_tangent():
    sph = unit_sphere()
    o, d, t_max, _ = rays([[0, 2.0, -3.0], [0, 1.0, -3.0]], [[0, 0, 1.0]] * 2)
    hit, t, _ = S.intersect_closest(sph, o, d, t_max)
    assert not bool(hit[0])      # clear miss
    assert bool(hit[1])          # tangent ray grazes at y=1
    np.testing.assert_allclose(t[1], 3.0, rtol=1e-3)


def test_sphere_translated():
    sph = unit_sphere(o2w=T.translate([0.0, 0.0, 5.0]))
    o, d, t_max, time = rays([0, 0, 0.0], [0, 0, 1.0])
    hit, t, idx = S.intersect_closest(sph, o, d, t_max)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)
    h = S.make_hit(sph, o, d, time, t, idx, hit)
    np.testing.assert_allclose(h.p[0], [0, 0, 4.0], atol=1e-5)


def test_sphere_spawned_ray_remisses():
    # From the hit point, a ray away from the sphere must miss
    # (mirrors reference spawned-ray re-miss test).
    sph = unit_sphere()
    o, d, t_max, time = rays([0, 0, -3.0], [0, 0, 1.0])
    hit, t, idx = S.intersect_closest(sph, o, d, t_max)
    h = S.make_hit(sph, o, d, time, t, idx, hit)
    o2 = h.p + 1e-4 * h.n
    hit2, _, _ = S.intersect_closest(sph, o2, -d, t_max)
    assert not bool(hit2[0])


def test_sphere_partial_clip():
    # Hemisphere (z >= 0): frontal ray along -z hits only the top.
    sph = S.pack_spheres(
        [{
            "object_to_world": T.identity(), "radius": 1.0,
            "z_min": 0.0, "z_max": 1.0, "material_id": 0,
        }]
    )
    # Ray along +z from below: t0 (z=-1) is clipped, t1 at z=+1 hits.
    o, d, t_max, _ = rays([0.3, 0, -3.0], [0, 0, 1.0])
    hit, t, _ = S.intersect_closest(sph, o, d, t_max)
    assert bool(hit[0])
    z_hit = -3.0 + float(t[0])
    assert z_hit > 0.0


def test_sphere_t_max_respected():
    sph = unit_sphere()
    o, d, _, _ = rays([0, 0, -3.0], [0, 0, 1.0])
    t_max = jnp.asarray([1.5], jnp.float32)
    hit, _, _ = S.intersect_closest(sph, o, d, t_max)
    assert not bool(hit[0])


def one_triangle(v0, v1, v2, normals=None):
    return Tr.pack_triangle_mesh(
        T.identity(),
        np.array([0, 1, 2], np.int64),
        np.array([v0, v1, v2], np.float32),
        normals=None if normals is None else np.array(normals, np.float32),
    )


def test_triangle_hit_uv_normal():
    tris = one_triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o, d, t_max, time = rays([0.2, 0.2, -2.0], [0, 0, 1.0])
    hit, t, idx = Tr.intersect_closest(tris, o, d, t_max)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
    h = Tr.make_hit(tris, o, d, time, idx, hit)
    np.testing.assert_allclose(h.p[0], [0.2, 0.2, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.abs(h.n[0]), [0, 0, 1], atol=1e-5)
    assert bool(Tr.intersect_p(tris, o, d, t_max)[0])


def test_triangle_miss_outside():
    tris = one_triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o, d, t_max, _ = rays([0.9, 0.9, -2.0], [0, 0, 1.0])  # outside hypotenuse
    hit, _, _ = Tr.intersect_closest(tris, o, d, t_max)
    assert not bool(hit[0])


def test_triangle_backface_and_parallel():
    tris = one_triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    # Parallel ray in the triangle plane: no hit.
    o, d, t_max, _ = rays([0.1, 0.1, 0.0], [1, 0, 0.0])
    hit, _, _ = Tr.intersect_closest(tris, o, d, t_max)
    assert not bool(hit[0])
    # From behind: still a hit (triangles are two-sided).
    o, d, t_max, _ = rays([0.2, 0.2, 2.0], [0, 0, -1.0])
    hit, _, _ = Tr.intersect_closest(tris, o, d, t_max)
    assert bool(hit[0])


def test_triangle_area_and_bounds():
    tris = one_triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(Tr.areas(tris)[0], 0.5, rtol=1e-6)
    wb = Tr.world_bounds_np(tris)
    np.testing.assert_allclose(wb[0, 0], [0, 0, 0])
    np.testing.assert_allclose(wb[0, 1], [1, 1, 0])


def test_triangle_shading_normals_interpolated():
    # Per-vertex normals tilted: shading normal at center is their average.
    n = [[0, 0, 1], [0, 0, 1], [0, 0, 1]]
    tris = one_triangle([0, 0, 0], [1, 0, 0], [0, 1, 0], normals=n)
    o, d, t_max, time = rays([0.25, 0.25, 2.0], [0, 0, -1.0])
    hit, t, idx = Tr.intersect_closest(tris, o, d, t_max)
    h = Tr.make_hit(tris, o, d, time, idx, hit)
    np.testing.assert_allclose(h.ns[0], [0, 0, 1], atol=1e-5)
    # Geometric normal flipped into shading hemisphere (authoritative).
    assert float(jnp.dot(h.n[0], h.ns[0])) > 0


def test_triangle_closest_of_two():
    tris = Tr.concat_triangles([
        one_triangle([0, 0, 1.0], [1, 0, 1.0], [0, 1, 1.0]),
        one_triangle([0, 0, 2.0], [1, 0, 2.0], [0, 1, 2.0]),
    ])
    o, d, t_max, _ = rays([0.2, 0.2, 0.0], [0, 0, 1.0])
    hit, t, idx = Tr.intersect_closest(tris, o, d, t_max)
    assert bool(hit[0]) and int(idx[0]) == 0
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)


def test_transformed_mesh_world_space():
    tris = Tr.pack_triangle_mesh(
        T.translate([0.0, 0.0, -5.0]),
        np.array([0, 1, 2], np.int64),
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
    )
    o, d, t_max, _ = rays([0.2, 0.2, 0.0], [0, 0, -1.0])
    hit, t, _ = Tr.intersect_closest(tris, o, d, t_max)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 5.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Double-single exact edge functions (the reference's f64 fallback,
# triangle_mesh.jl:194-197, reproduced without f64)
# ---------------------------------------------------------------------------

def test_edge_ds_recovers_f64_sign():
    from trace_tpu.shapes.triangle import _edge_ds
    import jax.numpy as jnp

    eps = np.float32(2.0 ** -23)
    a = jnp.float32(1.0 + eps)      # (1+e)(1+e) = 1+2e+e^2 -> fl = 1+2e
    b = jnp.float32(1.0 + eps)
    c = jnp.float32(1.0 + 2 * eps)  # (1+2e)(1) -> fl = 1+2e
    d = jnp.float32(1.0)
    naive = a * b - c * d
    assert float(naive) == 0.0            # f32 cancels exactly
    exact = float(_edge_ds(a, b, c, d))
    ref = float(np.float64(a) * np.float64(b) - np.float64(c) * np.float64(d))
    assert exact > 0.0 and ref > 0.0
    np.testing.assert_allclose(exact, ref, rtol=1e-6)


def test_shared_edge_ray_is_watertight():
    # A ray exactly through the shared diagonal of a split quad must hit
    # (boundary e == 0 accepted), with and without the ds fallback.
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.core import transform as T
    from trace_tpu.materials.materials import MatteMaterial
    import jax.numpy as jnp

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)  # shared 0-2 diagonal
    for exact in (False, True):
        b = SceneBuilder()
        mat = b.material(MatteMaterial())
        b.triangle_mesh(T.identity(), idx, verts, mat)
        scene = b.build(use_bvh=False, exact_shared_edges=exact)
        o = jnp.asarray([[0.5, 0.5, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = scene.intersect(o, d, jnp.full((1,), jnp.inf, jnp.float32))
        assert bool(hit.valid[0]), f"exact_edges={exact}"
        assert abs(float(hit.t[0]) - 5.0) < 1e-5


def test_mirrored_sphere_normal_matches_reference_semantics():
    """A handedness-swapping object_to_world double-flipped the sphere
    normal: the world-space dpdu x dpdv cross already carries sign(det),
    so packing flip = rev XOR swaps re-flipped it. Reference semantics
    (object-space cross, rev-xor-swaps flip, covariant transform,
    surface_interaction.jl:51-68/:154-181) net to
    n = (rev^swaps) * invT(M) * n_obj — for a mirror M = diag(1,1,-1)
    (same world geometry as identity) that is the IDENTITY sphere's
    normal NEGATED; reverse_orientation=True flips it back."""
    import dataclasses
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.materials.materials import MatteMaterial

    def normal(o2w, rev):
        b = SceneBuilder()
        mid = b.material(MatteMaterial())
        b.sphere(o2w, 1.0, mid, reverse_orientation=rev)
        scene = b.build()
        o = jnp.asarray([[0.3, 0.2, 3.0]], jnp.float32)
        dv = np.array([-0.1, -0.05, -1.0], np.float32)
        d = jnp.asarray(dv / np.linalg.norm(dv))[None]
        hit = scene.intersect(o, d, jnp.full(1, jnp.inf, jnp.float32))
        assert bool(hit.valid[0])
        return np.asarray(hit.p[0]), np.asarray(hit.n[0])

    p_id, n_id = normal(T.identity(), False)
    p_m, n_m = normal(T.scale(1.0, 1.0, -1.0), False)
    np.testing.assert_allclose(p_m, p_id, atol=1e-5)     # same world sphere
    np.testing.assert_allclose(n_m, -n_id, atol=1e-5)    # reference flip
    _, n_mr = normal(T.scale(1.0, 1.0, -1.0), True)
    np.testing.assert_allclose(n_mr, n_id, atol=1e-5)    # rev restores
    # Identity sphere: outward geometric normal at the hit point.
    np.testing.assert_allclose(n_id, p_id / np.linalg.norm(p_id), atol=1e-4)
