import jax.numpy as jnp
import numpy as np

from trace_tpu.core import bounds as B
from trace_tpu.core import transform as T


def test_union_expand_offset():
    b = B.from_points(jnp.array([0.0, 0, 0]), jnp.array([1.0, 2, 3]))
    b2 = B.union_point(b, jnp.array([-1.0, 0, 0]))
    np.testing.assert_allclose(b2.p_min, [-1, 0, 0])
    np.testing.assert_allclose(B.diagonal(b), [1, 2, 3])
    np.testing.assert_allclose(B.surface_area(b), 2 * (2 + 3 + 6))
    np.testing.assert_allclose(
        B.offset(b, jnp.array([0.5, 1.0, 1.5])), [0.5, 0.5, 0.5]
    )
    assert int(B.maximum_extent(b)) == 2


def test_bounding_sphere():
    b = B.from_points(jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]))
    c, r = B.bounding_sphere(b)
    np.testing.assert_allclose(c, [0, 0, 0])
    np.testing.assert_allclose(r, np.sqrt(3), rtol=1e-6)


def test_ray_aabb_intersection():
    # Mirrors reference test/test_intersection.jl:1-20.
    b = B.from_points(jnp.zeros(3), jnp.ones(3))
    o = jnp.array([0.5, 0.5, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    hit, t0, t1 = B.ray_intersect(b, o, d, jnp.float32(np.inf))
    assert bool(hit)
    np.testing.assert_allclose(t0, 1.0, rtol=1e-6)
    np.testing.assert_allclose(t1, 2.0, rtol=1e-6)
    # Precomputed-reciprocal predicate agrees.
    assert bool(B.ray_intersect_p(b, o, 1.0 / d, jnp.float32(np.inf)))
    # A ray pointing away misses.
    assert not bool(B.ray_intersect_p(b, o, 1.0 / -d, jnp.float32(np.inf)))


def test_ray_aabb_zero_component_direction():
    b = B.from_points(jnp.zeros(3), jnp.ones(3))
    o = jnp.array([0.5, 2.0, 0.5])
    d = jnp.array([0.0, -1.0, 0.0])
    hit, t0, _ = B.ray_intersect(b, o, d, jnp.float32(np.inf))
    assert bool(hit) and abs(float(t0) - 1.0) < 1e-6


def test_translate_scale_roundtrip():
    t = T.translate([1.0, 2.0, 3.0])
    p = jnp.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(T.apply_point(t, p), [2, 3, 4])
    np.testing.assert_allclose(T.apply_point(T.inverse(t), T.apply_point(t, p)), p)
    # Vectors unaffected by translation.
    np.testing.assert_allclose(T.apply_vec(t, p), p)
    s = T.scale(2.0, 3.0, 4.0)
    np.testing.assert_allclose(T.apply_point(s, p), [2, 3, 4])


def test_normal_transform_covariant():
    # Normals under nonuniform scale transform by inverse transpose.
    s = T.scale(2.0, 1.0, 1.0)
    n = jnp.array([1.0, 1.0, 0.0])
    out = T.apply_normal(s, n)
    np.testing.assert_allclose(out, [0.5, 1.0, 0.0])


def test_rotate_and_compose():
    r = T.rotate_z(90.0)
    p = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(T.apply_point(r, p), [0, 1, 0], atol=1e-6)
    r2 = T.rotate(90.0, [0.0, 0.0, 1.0])
    np.testing.assert_allclose(T.apply_point(r2, p), [0, 1, 0], atol=1e-6)
    c = T.compose(T.translate([0.0, 0, 1]), r)
    np.testing.assert_allclose(T.apply_point(c, p), [0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(
        T.apply_point(T.inverse(c), T.apply_point(c, p)), p, atol=1e-6
    )


def test_look_at():
    t = T.look_at([0.0, 0, 0], [0.0, 0, -1], [0.0, 1, 0])
    # Camera origin maps to world position.
    np.testing.assert_allclose(T.apply_point(t, jnp.zeros(3)), [0, 0, 0], atol=1e-6)
    # look_at's z-axis points from target to position (reference convention).
    np.testing.assert_allclose(T.apply_vec(t, jnp.array([0.0, 0, 1])), [0, 0, 1], atol=1e-6)


def test_swaps_handedness():
    assert bool(T.swaps_handedness(T.scale(-1.0, 1.0, 1.0)))
    assert not bool(T.swaps_handedness(T.scale(1.0, 1.0, 1.0)))


def test_apply_bounds():
    b = B.from_points(jnp.zeros(3), jnp.ones(3))
    t = T.rotate_z(45.0)
    tb = T.apply_bounds(t, b)
    # Rotated unit cube has x-extent [-sqrt(2)/2, sqrt(2)/2].
    np.testing.assert_allclose(tb.p_min[0], -np.sqrt(2) / 2, atol=1e-5)
    np.testing.assert_allclose(tb.p_max[0], np.sqrt(2) / 2, atol=1e-5)


def test_quaternion_slerp():
    q1 = T.quat_from_transform(T.rotate_z(0.0))
    q2 = T.quat_from_transform(T.rotate_z(90.0))
    qm = T.slerp(q1, q2, jnp.float32(0.5))
    tm = T.quat_to_transform(T.quat_normalize(qm))
    p = jnp.array([1.0, 0.0, 0.0])
    expect = T.apply_point(T.rotate_z(45.0), p)
    np.testing.assert_allclose(T.apply_point(tm, p), expect, atol=1e-5)


def test_perspective():
    t = T.perspective(90.0, 0.01, 1000.0)
    # On-axis point at z=1 projects to origin-ish x/y.
    p = T.apply_point(t, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(p[:2], [0, 0], atol=1e-6)


def test_ray_aabb_origin_on_slab_plane():
    # Regression: origin exactly on a slab plane with parallel direction
    # used to produce 0*inf = NaN and poison the hit mask.
    b = B.from_points(jnp.zeros(3), jnp.ones(3))
    o = jnp.array([0.0, 0.5, 2.0])  # x exactly on the x=0 slab plane
    d = jnp.array([0.0, 0.0, -1.0])
    hit, t0, t1 = B.ray_intersect(b, o, d, jnp.float32(np.inf))
    assert bool(hit)
    assert np.isfinite(float(t0)) and abs(float(t0) - 1.0) < 1e-6
    assert bool(B.ray_intersect_p(b, o, 1.0 / d, jnp.float32(np.inf)))
