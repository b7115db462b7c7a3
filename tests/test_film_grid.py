"""add_samples_grid (stencil splat) vs add_samples (scatter splat).

Same semantics by construction — per-(sample, pixel) filter weights use
identical formulas (incl. the reference's ceil/floor asymmetry and
one-wider footprint, film.jl:140-154); only the per-pixel summation
order differs, so equality is tight-allclose.
"""
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.film.film import Film
from trace_tpu.film.filters import LanczosSincFilter, TriangleFilter


def _grid_samples(film, seed=0):
    (x0, y0), (x1, y1) = film.sample_bounds()
    gw, gh = x1 - x0 + 1, y1 - y0 + 1
    xs = np.arange(x0, x1 + 1, dtype=np.int32)
    ys = np.arange(y0, y1 + 1, dtype=np.int32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    pixels = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    rng = np.random.default_rng(seed)
    n = pixels.shape[0]
    p_film = pixels.astype(np.float32) + rng.random((n, 2), np.float32)
    l_rgb = rng.random((n, 3), np.float32)
    w = rng.random(n).astype(np.float32) * 0.5 + 0.5
    valid = rng.random(n) < 0.9
    return (x0, y0), (gh, gw), jnp.asarray(p_film), jnp.asarray(l_rgb), \
        jnp.asarray(w), jnp.asarray(valid)


def _check(film, seed=0):
    origin, hw, p_film, l_rgb, w, valid = _grid_samples(film, seed)
    s0 = film.initial_state()
    a = film.add_samples(s0, p_film, l_rgb, w, valid=valid)
    b = film.add_samples_grid(s0, p_film, l_rgb, w, origin, hw,
                              valid=valid)
    np.testing.assert_allclose(np.asarray(a.weight_sum),
                               np.asarray(b.weight_sum),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz),
                               rtol=2e-5, atol=2e-6)
    assert float(jnp.sum(b.weight_sum)) > 0


def test_grid_splat_matches_scatter_lanczos():
    _check(Film((48, 40), filter=LanczosSincFilter((1.0, 1.0), 3.0)))


def test_grid_splat_matches_scatter_wide_triangle():
    _check(Film((32, 32), filter=TriangleFilter((2.0, 1.5))), seed=3)


def test_grid_splat_matches_scatter_crop():
    film = Film((64, 64), crop=((0.25, 0.25), (0.9, 0.8)),
                filter=LanczosSincFilter((1.0, 1.0), 3.0))
    _check(film, seed=5)
