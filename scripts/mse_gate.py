"""Hero-PNG MSE gate (VERDICT r4 missing #3).

Compares our rendered reference-hero config
(docs/renders/shadows_sppm_1024.png — spheres.jl:88-102 verbatim:
SPPM 1024², r0 0.025, depth 5, 100 iterations, wrong-order-inverse
camera quirk replicated) against the ONE pixel ground truth the
reference publishes: /root/reference/docs/src/assets/
shadows-sppm-1024x1024_mio.png (README.md:9-11).

Both images carry independent SPPM residual noise (ours: 100
iterations; the reference artifact's iteration count is unpublished),
so the gate compares BOX-DOWNSAMPLED images (default 8x -> 128²), where
photon noise averages out and composition/radiometry differences
remain. Prints one JSON line; tests/test_hero_mse.py asserts the
documented threshold.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OURS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "renders", "shadows_sppm_1024.png")
REF = "/root/reference/docs/src/assets/shadows-sppm-1024x1024_mio.png"


def load_rgb(path: str) -> np.ndarray:
    from trace_tpu.io.png import read_png

    img = read_png(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return img[..., :3].astype(np.float32) / 255.0


def box_down(img: np.ndarray, f: int) -> np.ndarray:
    h, w, c = img.shape
    return img[: h - h % f, : w - w % f].reshape(
        h // f, f, w // f, f, c).mean(axis=(1, 3))


def metrics(ours: np.ndarray, ref: np.ndarray, factor: int = 8):
    a = box_down(ours, factor)
    b = box_down(ref, factor)
    mse = float(np.mean((a - b) ** 2))
    return {
        "factor": factor,
        "mse": round(mse, 6),
        "rmse": round(float(np.sqrt(mse)), 6),
        "psnr_db": round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 2),
        "mean_ours": round(float(a.mean()), 4),
        "mean_ref": round(float(b.mean()), 4),
    }


def main():
    ours = load_rgb(OURS)
    ref = load_rgb(REF)
    out = {"ours": OURS, "ref": REF,
           "shape_ours": list(ours.shape), "shape_ref": list(ref.shape)}
    for f in (4, 8, 16):
        out[f"down{f}"] = metrics(ours, ref, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
