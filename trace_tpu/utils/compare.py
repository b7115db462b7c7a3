"""Image comparison harness (SURVEY.md §7 step 10).

The driver's quality oracle is MSE against reference renders; this module
provides the metrics (MSE, relative MSE, PSNR) and a small CLI:

    python -m trace_tpu.utils.compare a.png b.png [--crop x0 y0 x1 y1]

Reference goldens must be produced by running the Julia scenes (no Julia
in this image — BASELINE.md); until then the same harness powers
self-golden regression tests (tests/test_goldens.py).
"""
from __future__ import annotations

import numpy as np


def _to_float(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def mse(a, b) -> float:
    a, b = _to_float(a), _to_float(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.mean((a - b) ** 2))


def rel_mse(a, b, eps: float = 1e-2) -> float:
    """Relative MSE (normalized by the reference image b) — the standard
    rendering-quality metric, robust to overall brightness."""
    a, b = _to_float(a), _to_float(b)
    return float(np.mean(((a - b) ** 2) / (b * b + eps)))


def psnr(a, b) -> float:
    m = mse(a, b)
    return float("inf") if m == 0 else float(10.0 * np.log10(1.0 / m))


def compare(a, b) -> dict:
    return {"mse": mse(a, b), "rel_mse": rel_mse(a, b), "psnr": psnr(a, b)}


def main(argv=None) -> int:
    import argparse

    from ..io.png import read_png

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--crop", nargs=4, type=int, metavar=("X0", "Y0", "X1", "Y1"))
    args = p.parse_args(argv)
    a, b = read_png(args.a), read_png(args.b)
    if args.crop:
        x0, y0, x1, y1 = args.crop
        a, b = a[y0:y1, x0:x1], b[y0:y1, x0:x1]
    import json

    print(json.dumps(compare(a, b)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
