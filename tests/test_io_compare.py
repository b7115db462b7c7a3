"""OBJ loader + image-comparison harness tests, and a self-golden
regression render (loose MSE bound to tolerate backend numerics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from trace_tpu.utils.compare import mse, rel_mse, psnr, compare


def test_compare_metrics():
    a = np.zeros((4, 4, 3), np.float32)
    b = np.full((4, 4, 3), 0.1, np.float32)
    assert mse(a, a) == 0.0
    assert psnr(a, a) == float("inf")
    assert mse(a, b) == pytest.approx(0.01, rel=1e-5)
    assert rel_mse(b, b) == 0.0
    out = compare(a, b)
    assert set(out) == {"mse", "rel_mse", "psnr"}
    # uint8 images normalize to [0, 1]
    assert mse(np.zeros((2, 2, 3), np.uint8),
               np.full((2, 2, 3), 255, np.uint8)) == pytest.approx(1.0)


def test_obj_loader_roundtrip(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
    )
    from trace_tpu.io.obj import load_obj

    m = load_obj(str(path))
    assert m["vertices"].shape == (4, 3)
    assert m["indices"].shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_array_equal(m["indices"], [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m["normals"], [[0, 0, 1]] * 4)
    assert m["uv"].shape == (4, 2)
    # negative (relative) indices
    path2 = tmp_path / "neg.obj"
    path2.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m2 = load_obj(str(path2))
    np.testing.assert_array_equal(m2["indices"], [[0, 1, 2]])


def test_whitted_self_golden():
    """Regression guard: the 16x16 shadows render must stay close to the
    committed golden (loose MSE so CPU/TPU numerics both pass; catches
    estimator/camera/film regressions, not noise-level changes)."""
    import os

    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene()
    cam = build_camera(resolution=16, filename="/tmp/_golden16.png")
    state = WhittedIntegrator(cam, UniformSampler(1, seed=11),
                              max_depth=3).render(scene)
    img = np.asarray(cam.film.to_image(state))
    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", "shadows16.npy"
    )
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.save(golden_path, img)
        pytest.skip("golden created")
    golden = np.load(golden_path)
    assert mse(img, golden) < 5e-4, mse(img, golden)
