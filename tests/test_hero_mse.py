"""Hero-PNG MSE gate: our rendered reference-hero config vs the ONE
pixel ground truth the reference publishes (VERDICT r4 missing #3).

Measured on the checked-in render (scripts/mse_gate.py, 2026-08-21):
box-8x-downsampled MSE 5.0e-05 (PSNR 43.0 dB), mean radiance 0.3812 vs
0.3804. Thresholds below carry ~6x margin over that measurement —
tight enough that a camera/radiometry/composition regression (the
round-1 failure mode: a full-unit screen-window shift from the
reference's wrong-order-inverse quirk) fails by orders of magnitude,
loose enough that SPPM residual noise (independent photon seeds on
both sides) cannot flake the gate. Rationale in PARITY.md "Hero MSE".
"""
import os

import numpy as np
import pytest

REF = "/root/reference/docs/src/assets/shadows-sppm-1024x1024_mio.png"
OURS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "renders",
    "shadows_sppm_1024.png")


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference artifact unavailable")
def test_hero_render_matches_reference_artifact():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.mse_gate import load_rgb, metrics

    ours = load_rgb(OURS)
    ref = load_rgb(REF)
    assert ours.shape == ref.shape == (1024, 1024, 3)
    m8 = metrics(ours, ref, 8)
    assert m8["mse"] < 3e-4, m8
    assert abs(m8["mean_ours"] - m8["mean_ref"]) < 0.01, m8
    m4 = metrics(ours, ref, 4)
    assert m4["mse"] < 6e-4, m4
