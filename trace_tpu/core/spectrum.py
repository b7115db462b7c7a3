"""Radiometry: RGB spectra as plain ``[..., 3]`` float32 arrays.

TPU-native counterpart of /root/reference/src/spectrum.jl. Instead of a
wrapper type, spectra are bare arrays; this file provides the color-space
conversions and small predicates the integrators use.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Row-vector convention: xyz = rgb @ RGB_TO_XYZ_M.T (same coefficients as
# reference spectrum.jl:1-14).
XYZ_TO_RGB_M = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=jnp.float32,
)
RGB_TO_XYZ_M = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)


def xyz_to_rgb(xyz):
    M = XYZ_TO_RGB_M
    return jnp.stack(
        [
            M[i, 0] * xyz[..., 0] + M[i, 1] * xyz[..., 1]
            + M[i, 2] * xyz[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )  # exact f32 (einsum hits the MXU bf16 default on TPU)


def rgb_to_xyz(rgb):
    M = RGB_TO_XYZ_M
    return jnp.stack(
        [
            M[i, 0] * rgb[..., 0] + M[i, 1] * rgb[..., 1]
            + M[i, 2] * rgb[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def to_y(rgb):
    """Luminance (reference spectrum.jl:64-66)."""
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


def clamp_spectrum(rgb, low=0.0, high=jnp.inf):
    return jnp.clip(rgb, low, high)
