"""ImageTexture / MipMap (beyond-reference: the Julia reference's texture
layer stops at BilerpTexture, textures/basic.jl). Oracles are plain NumPy."""
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.core.interaction import empty_hit
from trace_tpu.materials.textures import (
    ImageTexture, MipMap, UVMapping2D, image_texture,
)
from trace_tpu.utils.pytree import replace


def _hit_at(st, width=0.0):
    """A hit batch whose uv are ``st`` with isotropic footprint ``width``."""
    st = np.asarray(st, np.float32)
    n = st.shape[0]
    h = empty_hit((n,))
    w = jnp.full((n,), np.float32(width))
    return replace(
        h, uv=jnp.asarray(st), dudx=w, dvdy=w,
        dudy=jnp.zeros((n,)), dvdx=jnp.zeros((n,)),
    )


def _np_bilerp(img, s, t, wrap="repeat"):
    hgt, wid = img.shape[:2]
    x, y = s * wid - 0.5, t * hgt - 0.5
    x0, y0 = np.floor(x), np.floor(y)
    fx, fy = x - x0, y - y0
    out = 0.0
    for dx, wx in ((0, 1 - fx), (1, fx)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            xi, yi = x0 + dx, y0 + dy
            if wrap == "repeat":
                xi, yi = xi % wid, yi % hgt
            xi = np.clip(xi, 0, wid - 1).astype(int)
            yi = np.clip(yi, 0, hgt - 1).astype(int)
            out = out + (wx * wy)[:, None] * img[yi, xi]
    return out


def test_level0_matches_numpy_bilerp():
    rng = np.random.default_rng(3)
    img = rng.random((8, 8, 3), np.float32)
    tex = ImageTexture(UVMapping2D(), MipMap(img))
    st = rng.random((64, 2), np.float32)
    got = np.asarray(jax.jit(tex)(_hit_at(st)))
    want = _np_bilerp(img, st[:, 0], st[:, 1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_wide_footprint_returns_image_mean():
    rng = np.random.default_rng(4)
    img = rng.random((16, 8, 3), np.float32)
    tex = ImageTexture(UVMapping2D(), MipMap(img))
    got = np.asarray(tex(_hit_at([[0.3, 0.7], [0.9, 0.1]], width=4.0)))
    mean = img.mean(axis=(0, 1))
    np.testing.assert_allclose(got, np.tile(mean, (2, 1)), rtol=1e-5,
                               atol=1e-6)


def test_level_interpolation_is_monotone_between_levels():
    # A checkerboard's fine level has extremes, coarse levels converge to
    # 0.5 — widening the footprint must move the value toward the mean.
    img = np.indices((8, 8)).sum(0) % 2
    img = np.repeat(img[..., None], 3, -1).astype(np.float32)
    tex = ImageTexture(UVMapping2D(), MipMap(img))
    st = [[0.1875, 0.0625]]  # center of a white texel
    # widths: exact level 0, half-way 0<->1 (2^-2.5), level 1, coarsest.
    vals = [
        float(np.asarray(tex(_hit_at(st, width=w)))[0, 0])
        for w in (0.0, 2.0 ** -2.5, 0.25, 1.0)
    ]
    assert vals[0] > vals[1] > vals[2] >= vals[3] - 1e-6
    np.testing.assert_allclose(vals[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(vals[2], 0.5, atol=1e-6)
    np.testing.assert_allclose(vals[3], 0.5, atol=1e-6)


def test_wrap_modes():
    img = np.linspace(0, 1, 4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    st = np.array([[1.25, 0.5], [-0.25, 0.5]], np.float32)
    rep = np.asarray(ImageTexture(UVMapping2D(), MipMap(img, "repeat"))(
        _hit_at(st)))
    clm = np.asarray(ImageTexture(UVMapping2D(), MipMap(img, "clamp"))(
        _hit_at(st)))
    blk = np.asarray(ImageTexture(UVMapping2D(), MipMap(img, "black"))(
        _hit_at(st)))
    np.testing.assert_allclose(
        rep, _np_bilerp(img, st[:, 0], st[:, 1], "repeat"), rtol=1e-5)
    np.testing.assert_allclose(
        clm, _np_bilerp(img, st[:, 0], st[:, 1], "clamp"), rtol=1e-5)
    # 1.25 /
    # -0.25 are half a texel outside: black wrap zeroes the outside taps.
    assert (blk <= clm + 1e-6).all()
    far = np.asarray(ImageTexture(UVMapping2D(), MipMap(img, "black"))(
        _hit_at([[2.5, 0.5]])))
    np.testing.assert_allclose(far, 0.0, atol=1e-7)


def test_scalar_image_returns_1d():
    img = np.full((4, 4), 0.25, np.float32)
    tex = ImageTexture(UVMapping2D(), MipMap(img))
    out = tex(_hit_at([[0.5, 0.5], [0.1, 0.9]]))
    assert out.shape == (2,)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)


def test_non_pow2_constant_image_stays_constant():
    img = np.full((6, 10, 3), 0.75, np.float32)
    tex = ImageTexture(UVMapping2D(), MipMap(img))
    for w in (0.0, 0.3, 2.0):
        out = np.asarray(tex(_hit_at([[0.33, 0.77]], width=w)))
        np.testing.assert_allclose(out, 0.75, rtol=1e-5)


def test_png_loader_roundtrip(tmp_path):
    from trace_tpu.io.png import write_png

    rng = np.random.default_rng(5)
    img8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    path = str(tmp_path / "tex.png")
    write_png(path, img8)
    tex = image_texture(path, gamma=False)
    # Texel centers reproduce the quantized image exactly.
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    st = np.stack([(xs.ravel() + 0.5) / 8, (ys.ravel() + 0.5) / 8], -1)
    got = np.asarray(tex(_hit_at(st.astype(np.float32))))
    np.testing.assert_allclose(
        got, img8.reshape(-1, 3).astype(np.float32) / 255.0, atol=1e-6)
    # gamma=True decodes sRGB: darker-or-equal everywhere, monotone.
    tex_g = image_texture(path, gamma=True)
    got_g = np.asarray(tex_g(_hit_at(st.astype(np.float32))))
    assert (got_g <= got + 1e-6).all()


def test_uvmapping_scale_feeds_footprint():
    # UVMapping2D(su, sv) scales both st and its differentials, so a
    # scaled mapping must select a coarser level for the same hit.
    img = np.indices((8, 8)).sum(0) % 2
    img = np.repeat(img[..., None], 3, -1).astype(np.float32)
    t1 = ImageTexture(UVMapping2D(), MipMap(img))
    t8 = ImageTexture(UVMapping2D(su=8.0, sv=8.0), MipMap(img))
    hit = _hit_at([[0.0625, 0.0625]], width=0.125)
    v1 = float(np.asarray(t1(hit))[0, 0])  # level 0: exact black texel
    v8 = float(np.asarray(t8(hit))[0, 0])  # width 1 -> coarsest: mean
    np.testing.assert_allclose(v1, 0.0, atol=1e-6)
    np.testing.assert_allclose(v8, 0.5, atol=1e-6)


def test_textured_matte_material_renders():
    """End-to-end: an ImageTexture Kd through the material layer."""
    from trace_tpu.bxdf import bsdf as B
    from trace_tpu.materials.materials import MatteMaterial

    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = [1.0, 0.0, 0.0]
    img[:, 2:] = [0.0, 1.0, 0.0]
    mat = MatteMaterial(Kd=ImageTexture(UVMapping2D(), MipMap(img, "clamp")))
    hit = _hit_at([[0.125, 0.5], [0.875, 0.5]])
    lobes = B.empty_lobes(2)
    lobes = mat.add_lobes(lobes, hit, jnp.array([True, True]), True, 0)
    c0 = np.asarray(lobes.c0[:, 0])
    np.testing.assert_allclose(c0[0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c0[1], [0.0, 1.0, 0.0], atol=1e-6)
