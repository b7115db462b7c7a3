import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.core import transform as T
from trace_tpu.film.filters import LanczosSincFilter, BoxFilter
from trace_tpu.film.film import Film
from trace_tpu.camera.perspective import PerspectiveCamera
from trace_tpu.sampler.halton import radical_inverse
from trace_tpu.sampler.distribution import Distribution1D
from trace_tpu.sampler.uniform import get_camera_samples


def test_lanczos_values():
    f = LanczosSincFilter((1.0, 1.0), 3.0)
    np.testing.assert_allclose(f(jnp.array([0.0, 0.0])), 1.0, atol=1e-5)
    assert float(f(jnp.array([1.1, 0.0]))) == 0.0
    # windowed_sinc(0.5, 1, 3) = sinc(0.5)*sinc(1/6)
    expect = (np.sin(np.pi * 0.5) / (np.pi * 0.5)) * (
        np.sin(np.pi / 6) / (np.pi / 6)
    )
    np.testing.assert_allclose(f(jnp.array([0.5, 0.0])), expect, rtol=1e-5)


def test_film_sample_bounds():
    film = Film((1024, 1024), filter=LanczosSincFilter((1.0, 1.0), 3.0))
    lo, hi = film.sample_bounds()
    assert lo == (0, 0) and hi == (1025, 1025)
    assert film.width == 1024 and film.height == 1024


def test_film_crop_window():
    film = Film((100, 100), crop=((0.25, 0.25), (0.75, 0.75)))
    assert film.crop_min == (26, 26) and film.crop_max == (75, 75)
    assert film.width == 50 and film.height == 50


def test_film_add_sample_symmetry_and_peak():
    film = Film((16, 16), filter=LanczosSincFilter((1.0, 1.0), 3.0))
    state = film.initial_state()
    p = jnp.array([[5.5, 5.5]], jnp.float32)
    L = jnp.array([[1.0, 1.0, 1.0]], jnp.float32)
    state = film.add_samples(state, p, L, jnp.ones(1, jnp.float32))
    ws = np.asarray(state.weight_sum)
    # 1-based pixel (5,5) -> 0-based (4,4)
    assert ws[4, 4] == ws.max() and ws[4, 4] > 0
    # Symmetric neighbors get equal weight.
    np.testing.assert_allclose(ws[4, 3], ws[4, 5], rtol=1e-6)
    np.testing.assert_allclose(ws[3, 4], ws[5, 4], rtol=1e-6)


def test_film_weight_normalization_roundtrip():
    film = Film((8, 8), filter=BoxFilter((0.5, 0.5)))
    state = film.initial_state()
    p = jnp.array([[3.5, 3.5]], jnp.float32)
    L = jnp.array([[0.25, 0.5, 0.75]], jnp.float32)
    state = film.add_samples(state, p, L, jnp.ones(1, jnp.float32))
    img = np.asarray(film.to_image(state))
    # rgb->xyz->rgb uses the reference's matrices, which are not exact
    # inverses of each other (~0.3% drift, same as the reference pipeline).
    np.testing.assert_allclose(img[2, 2], [0.25, 0.5, 0.75], atol=3e-3)


def test_film_two_samples_average():
    film = Film((8, 8), filter=BoxFilter((0.5, 0.5)))
    state = film.initial_state()
    p = jnp.array([[3.5, 3.5], [3.5, 3.5]], jnp.float32)
    L = jnp.array([[1.0, 0, 0], [0.0, 0, 0]], jnp.float32)
    state = film.add_samples(state, p, L, jnp.ones(2, jnp.float32))
    img = np.asarray(film.to_image(state))
    np.testing.assert_allclose(img[2, 2], [0.5, 0, 0], atol=3e-3)


def test_png_roundtrip(tmp_path):
    from trace_tpu.io.png import write_png, read_png

    img = (np.random.RandomState(0).rand(10, 12, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(img, back)


def _shadows_camera(res=1024):
    film = Film((res, res), filter=LanczosSincFilter((1.0, 1.0), 3.0))
    return PerspectiveCamera(
        T.look_at([0.0, 15.0, 50.0], [0.0, 0.0, -2.0], [0.0, 1.0, 0.0]),
        screen_window=((-1.0, -1.0), (1.0, 1.0)),
        fov=90.0,
        film=film,
    )


def test_camera_rays_match_reference_chain():
    # Expected values computed by independently replicating the reference's
    # transform chain (incl. its column-major perspective matrix AND its
    # wrong-order inverse composition, transformations.jl:20-22) in f64
    # numpy (tests/oracle_whitted.py OracleCamera at res 1024).
    cam = _shadows_camera()
    p = jnp.array([[0.0, 0.0], [512.0, 512.0], [1024.0, 1024.0]], jnp.float32)
    rd, w = cam.generate_ray_differentials(
        p, jnp.zeros((3, 2), jnp.float32), jnp.zeros(3, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(w), 1.0)
    np.testing.assert_allclose(
        rd.o[0], [0.0, 15.0, 50.0], atol=1e-4
    )
    np.testing.assert_allclose(
        rd.d[0], [0.0, -0.2771, -0.9608], atol=2e-3
    )
    np.testing.assert_allclose(
        rd.d[1], [0.01, -0.2675, -0.9635], atol=2e-3
    )
    np.testing.assert_allclose(
        rd.d[2], [0.02, -0.2578, -0.9660], atol=2e-3
    )
    # Differential structure: a film-space shift moves the direction the
    # right way. The reference's telephoto chain makes a ONE-pixel shift
    # sit at f32 cancellation scale (~2e-5 through O(10) intermediates), so
    # probe with a 64-pixel shift — same code path, measurable signal.
    _, d_c = cam._one_ray(p, jnp.zeros((3, 2), jnp.float32))
    _, dx_c = cam._one_ray(
        p + jnp.asarray([64.0, 0.0], jnp.float32),
        jnp.zeros((3, 2), jnp.float32),
    )
    assert float(dx_c[1, 0] - d_c[1, 0]) > 1e-5
    assert bool(rd.has_differentials[0])


def test_camera_ray_directions_normalized():
    cam = _shadows_camera(64)
    p = jnp.array(np.random.RandomState(0).rand(32, 2) * 64, jnp.float32)
    rd, _ = cam.generate_ray_differentials(
        p, jnp.zeros((32, 2), jnp.float32), jnp.zeros(32, jnp.float32)
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rd.d), axis=-1), 1.0, atol=1e-5
    )


def test_radical_inverse_base2():
    a = jnp.array([1, 2, 3, 4], jnp.uint32)
    out = np.asarray(radical_inverse(0, a))
    np.testing.assert_allclose(out, [0.5, 0.25, 0.75, 0.125], atol=1e-7)


def test_radical_inverse_base3():
    # base_index 1 -> first odd prime, 3 (reference PRIMES omits 2).
    a = jnp.array([1, 2, 3, 5], jnp.uint32)
    out = np.asarray(radical_inverse(1, a))
    np.testing.assert_allclose(out, [1 / 3, 2 / 3, 1 / 9, 7 / 9], atol=1e-6)


def test_distribution1d():
    d = Distribution1D([1.0, 3.0])
    idx, pdf, rem = d.sample_discrete(jnp.array([0.1, 0.5, 0.9], jnp.float32))
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 1])
    np.testing.assert_allclose(np.asarray(pdf), [0.25 / 2 * 2, 0.75, 0.75], atol=1e-6)
    # u=0.1 remapped within [0, 0.25) -> 0.4
    np.testing.assert_allclose(float(rem[0]), 0.4, atol=1e-6)


def test_camera_samples_jitter_in_pixel():
    key = jax.random.key(0)
    pix = jnp.array([[3, 7]] * 64, jnp.int32)
    p_film, u_lens, u_time = get_camera_samples(key, pix)
    assert float(p_film[:, 0].min()) >= 3.0 and float(p_film[:, 0].max()) < 4.0
    assert float(p_film[:, 1].min()) >= 7.0 and float(p_film[:, 1].max()) < 8.0
    assert u_lens.shape == (64, 2) and u_time.shape == (64,)


def test_pbrt_convention_camera_aims_at_target():
    """convention="pbrt" (camera/perspective.py) gives standard framing:
    the center pixel's ray points from the eye toward the look_at target
    and corner rays spread by the field of view."""
    import numpy as np
    import jax.numpy as jnp
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.core import transform as T
    from trace_tpu.film.film import Film

    film = Film((64, 64), filename="/tmp/pbrt_cam.png")
    eye, target = [1.0, 2.0, 3.0], [4.0, 0.0, -5.0]
    cam = PerspectiveCamera(
        T.look_at(eye, target, [0.0, 1.0, 0.0]),
        fov=90.0, film=film, convention="pbrt",
    )
    p_film = jnp.asarray([[32.5, 32.5], [1.0, 1.0], [64.0, 64.0]], jnp.float32)
    u = jnp.zeros((3, 2), jnp.float32)
    rd, w = cam.generate_ray_differentials(p_film, u, jnp.zeros(3))
    d = np.asarray(rd.d)
    want = np.array(target, np.float32) - np.array(eye, np.float32)
    want /= np.linalg.norm(want)
    assert np.allclose(d[0], want, atol=0.05), (d[0], want)
    # ~90 deg fov: corner rays ~60+ degrees apart.
    assert float(np.dot(d[1], d[2])) < 0.5
    assert np.allclose(np.asarray(rd.o), np.array(eye), atol=1e-4)


def test_film_invalid_lane_does_not_dim_footprint():
    # A disabled (padded) lane at pixel (0,0) must contribute NOTHING —
    # including filter weight_sum: its Lanczos footprint reaches crop
    # pixels 1..4 and would otherwise dim the corner (base.py pads chunk
    # tails with pixel (0,0), lane_valid False).
    film = Film((16, 16), filter=LanczosSincFilter((4.0, 4.0), 3.0))
    state = film.initial_state()
    p = jnp.array([[0.0, 0.0]], jnp.float32)
    L = jnp.zeros((1, 3), jnp.float32)
    state = film.add_samples(
        state, p, L, jnp.zeros(1, jnp.float32),
        valid=jnp.zeros(1, bool),
    )
    assert float(np.abs(np.asarray(state.weight_sum)).max()) == 0.0
    # Same lane with valid=True DOES land weight (the guard is the mask,
    # not the footprint clamp).
    state2 = film.add_samples(
        state, p, L, jnp.ones(1, jnp.float32),
        valid=jnp.ones(1, bool),
    )
    assert float(np.abs(np.asarray(state2.weight_sum)).max()) > 0.0


def test_film_out_of_crop_splats_dropped():
    film = Film((8, 8))
    state = film.initial_state()
    p = jnp.array([[-3.0, 4.0], [100.0, 4.0], [4.5, 4.5]], jnp.float32)
    L = jnp.ones((3, 3), jnp.float32)
    state = film.add_splats(state, p, L)
    s = np.asarray(state.splat_xyz)
    # Only the in-crop splat lands; the OOB ones are dropped, not clamped
    # onto the border columns.
    assert s[3, 3].sum() > 0
    assert s[3, 0].sum() == 0.0 and s[3, 7].sum() == 0.0
    assert float(s.sum()) == pytest.approx(float(s[3, 3].sum()))
    # Non-finite radiance on a DROPPED lane must not leak NaN into the
    # clamped in-crop index (where-select, not mask-multiply).
    bad = film.add_splats(
        state, jnp.array([[-3.0, 4.0]], jnp.float32),
        jnp.full((1, 3), jnp.inf, jnp.float32),
    )
    assert np.isfinite(np.asarray(bad.splat_xyz)).all()


def test_distribution1d_under_jit():
    d = Distribution1D([1.0, 3.0, 2.0])
    u = jnp.array([0.05, 0.5, 0.95], jnp.float32)
    idx_e, pdf_e, rem_e = d.sample_discrete(u)
    idx_j, pdf_j, rem_j = jax.jit(d.sample_discrete)(u)
    np.testing.assert_array_equal(np.asarray(idx_e), np.asarray(idx_j))
    np.testing.assert_allclose(np.asarray(pdf_e), np.asarray(pdf_j))
    np.testing.assert_allclose(np.asarray(rem_e), np.asarray(rem_j))
    x_e, p_e, o_e = d.sample_continuous(u)
    x_j, p_j, o_j = jax.jit(d.sample_continuous)(u)
    # jit fuses the divide differently -> 1 ulp
    np.testing.assert_allclose(np.asarray(x_e), np.asarray(x_j), rtol=1e-6)


def test_radical_inverse_large_index_no_overflow():
    # Digit reversal of a full uint32 index overflows a single uint32
    # accumulator for bases >= 3 (e.g. base 5: 14 digits -> up to ~6.1e9).
    # Oracle: exact integer reversal in Python, scaled in float64.
    idxs = np.array([1_300_000_001, 3_500_000_000, 4_294_967_295],
                    np.uint32)
    from trace_tpu.sampler.halton import PRIMES
    for base_index in (1, 2, 3):  # bases 3, 5, 7
        b = int(PRIMES[base_index])
        out = np.asarray(radical_inverse(base_index, jnp.asarray(idxs)))
        for i, a in enumerate(idxs.tolist()):
            rev, n_dig = 0, 0
            aa = a
            while aa:
                rev = rev * b + aa % b
                aa //= b
                n_dig += 1
            oracle = rev / float(b) ** n_dig
            assert out[i] == pytest.approx(oracle, abs=2e-6), (b, a)


def test_camera_requires_film():
    with pytest.raises(ValueError):
        PerspectiveCamera(T.identity(), fov=60.0)


@pytest.mark.parametrize("convention", ["reference", "pbrt"])
def test_dof_lens_rays_converge_at_focal_plane(convention):
    # Camera-space rays travel toward -z; with a lens, all rays for one
    # film point must still head INTO the scene (d.z < 0 — the reference
    # divides by +d.z, perspective.jl:99, flipping them backwards) and
    # converge at the focal plane z = -focal_distance.
    film = Film((64, 64))
    fd = 5.0
    cam = PerspectiveCamera(T.identity(), film=film, fov=60.0,
                            convention=convention,
                            lens_radius=0.2, focal_distance=fd)
    p = jnp.tile(jnp.asarray([[20.5, 40.5]], jnp.float32), (8, 1))
    u = jax.random.uniform(jax.random.key(7), (8, 2))
    o, d = cam._one_ray(p, u)
    o, d = np.asarray(o), np.asarray(d)
    assert np.all(d[:, 2] < 0)
    # March each lens ray to the focal plane: common convergence point.
    t = (-fd - o[:, 2]) / d[:, 2]
    assert np.all(t > 0)
    pts = o + t[:, None] * d
    assert np.max(np.ptp(pts, axis=0)) < 1e-4


def test_dof_pinhole_matches_zero_radius_limit():
    # lens_radius -> 0 converges to the pinhole ray.
    film = Film((32, 32))
    p = jnp.asarray([[10.5, 22.5]], jnp.float32)
    u = jnp.asarray([[0.3, 0.8]], jnp.float32)
    cam0 = PerspectiveCamera(T.identity(), film=film, fov=60.0)
    o0, d0 = cam0._one_ray(p, u)
    cam1 = PerspectiveCamera(T.identity(), film=film, fov=60.0,
                             lens_radius=1e-5, focal_distance=5.0)
    o1, d1 = cam1._one_ray(p, u)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_reference_convention_replicates_julia_inverse_composition():
    """The reference composes cached inverses in the SAME order as the
    forward product (transformations.jl:20-22), so its raster_to_screen
    translation column is scaled by the raster diag — the effective
    screen window sits ~[0,2)^2, a full unit off a true inverse. The
    default convention must reproduce that chain BIT-exactly (f32)."""
    def t_scale(x, y, z):
        return (np.diag([x, y, z, 1.0]).astype(np.float32),
                np.diag([1 / x, 1 / y, 1 / z, 1.0]).astype(np.float32))

    def t_translate(v):
        m_ = np.eye(4, dtype=np.float32); m_[:3, 3] = v
        i_ = np.eye(4, dtype=np.float32); i_[:3, 3] = [-v[0], -v[1], -v[2]]
        return (m_, i_)

    def t_from(mat):
        mat = np.asarray(mat, np.float32)
        return (mat, np.linalg.inv(mat).astype(np.float32))

    def mul_ref(t1, t2):  # transformations.jl:20-22 (wrong-order inv)
        return (t1[0] @ t2[0], t1[1] @ t2[1])

    def inv_ref(t):
        return (t[1], t[0])

    fov, near, far = 90.0, 1e-2, 1000.0
    a_, b_ = far / (far - near), -far * near / (far - near)
    p = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, a_, 1], [0, 0, b_, 0]],
                 np.float32)
    it = 1.0 / np.tan(np.deg2rad(fov) / 2)
    cam_to_screen = mul_ref(t_scale(it, it, 1.0), t_from(p))
    res = 256
    s2r = mul_ref(mul_ref(t_scale(res, res, 1.0), t_scale(0.5, 0.5, 1.0)),
                  t_translate([1.0, -1.0, 0.0]))
    r2c_ref = mul_ref(inv_ref(cam_to_screen), inv_ref(s2r))[0]

    cam = PerspectiveCamera(T.identity(), film=Film((res, res)), fov=fov)
    np.testing.assert_array_equal(np.asarray(cam.raster_to_camera.m), r2c_ref)
    # And the quirk is actually present: raster (0,0) lands near screen 0,
    # not at the window corner -1.
    rs = np.asarray(cam.raster_to_screen.m)
    assert abs(rs[0, 3]) < 0.01 and abs(rs[1, 3]) < 0.01
