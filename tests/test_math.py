import jax.numpy as jnp
import numpy as np

from trace_tpu.core import math as m


def test_dot_cross_normalize():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    assert m.dot(a, b) == 0.0
    np.testing.assert_allclose(m.cross(a, b), [0, 0, 1])
    v = m.normalize(jnp.array([3.0, 0.0, 4.0]))
    np.testing.assert_allclose(m.length(v), 1.0, rtol=1e-6)


def test_reflect():
    wo = jnp.array([1.0, 0.0, 1.0]) / np.sqrt(2)
    n = jnp.array([0.0, 0.0, 1.0])
    wi = m.reflect(wo, n)
    np.testing.assert_allclose(wi, [-wo[0], 0.0, wo[2]], atol=1e-7)


def test_face_forward():
    n = jnp.array([0.0, 0.0, 1.0])
    v = jnp.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(m.face_forward(n, v), [0, 0, -1])
    np.testing.assert_allclose(m.face_forward(n, -v), [0, 0, 1])


def test_refract_straight_through():
    # Normal incidence, eta=1: passes straight through.
    wi = jnp.array([0.0, 0.0, 1.0])
    n = jnp.array([0.0, 0.0, 1.0])
    valid, wt = m.refract(wi, n, jnp.float32(1.0))
    assert bool(valid)
    np.testing.assert_allclose(wt, [0, 0, -1], atol=1e-6)


def test_refract_tir():
    # Grazing incidence from dense medium: total internal reflection.
    wi = m.normalize(jnp.array([0.9, 0.0, 0.1]))
    n = jnp.array([0.0, 0.0, 1.0])
    valid, _ = m.refract(wi, n, jnp.float32(1.5))
    assert not bool(valid)


def test_concentric_sample_disk():
    # Center maps to center; radius stays <= 1.
    p = m.concentric_sample_disk(jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(p, [0.0, 0.0], atol=1e-6)
    u = jnp.array(np.random.RandomState(0).rand(128, 2), jnp.float32)
    d = m.concentric_sample_disk(u)
    assert float(jnp.max(jnp.sum(d * d, axis=-1))) <= 1.0 + 1e-6


def test_cosine_sample_hemisphere():
    u = jnp.array(np.random.RandomState(1).rand(256, 2), jnp.float32)
    w = m.cosine_sample_hemisphere(u)
    assert float(jnp.min(w[:, 2])) >= 0.0
    np.testing.assert_allclose(m.length(w), np.ones(256), atol=1e-5)


def test_uniform_sample_sphere_cone():
    u = jnp.array(np.random.RandomState(2).rand(256, 2), jnp.float32)
    w = m.uniform_sample_sphere(u)
    np.testing.assert_allclose(m.length(w), np.ones(256), atol=1e-5)
    cos_max = jnp.float32(0.8)
    wc = m.uniform_sample_cone(u, cos_max)
    assert float(jnp.min(wc[:, 2])) >= 0.8 - 1e-5
    np.testing.assert_allclose(
        m.uniform_cone_pdf(cos_max), 1.0 / (2 * np.pi * 0.2), rtol=1e-5
    )


def test_shading_trig():
    w = m.normalize(jnp.array([1.0, 2.0, 2.0]))
    np.testing.assert_allclose(m.cos_theta(w), 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(
        m.sin_theta(w) ** 2 + m.cos_theta(w) ** 2, 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        m.cos_phi(w) ** 2 + m.sin_phi(w) ** 2, 1.0, rtol=1e-5
    )


def test_coordinate_system_orthonormal():
    v = m.normalize(jnp.array(np.random.RandomState(3).randn(64, 3), jnp.float32))
    v1, v2, v3 = m.coordinate_system(v)
    np.testing.assert_allclose(m.dot(v1, v2), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(m.dot(v1, v3), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(m.length(v2), np.ones(64), atol=1e-5)


def test_power_heuristic():
    assert float(m.power_heuristic(1, jnp.float32(1.0), 1, jnp.float32(1.0))) == 0.5
    assert float(m.power_heuristic(1, jnp.float32(0.0), 1, jnp.float32(0.0))) == 0.0
