"""Serving-gate harness regression (the real gate artifact is GATE.json,
produced on the TPU by `python -m tpusr.tools.serving_gate`; this smoke
keeps the harness runnable end-to-end on the CPU mesh)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains real-size VGG16/EDSR briefly

from tpusr.tools.serving_gate import make_surface_images, run_gate


def test_surface_dataset_is_discriminative_and_balanced():
    img, labels = make_surface_images(0, 8, 128)
    img, labels = np.asarray(img), np.asarray(labels)
    assert img.shape == (8, 128, 128, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert sorted(np.bincount(labels).tolist()) == [4, 4]
    # stripe classes have visibly more mid-frequency energy
    f = np.abs(np.fft.fft2(img[..., 0]))
    # stripe period 32-64 px at size 128 -> energy concentrates in freq
    # bins 2..4 along the stripe normal
    ring = (f[:, 2:6, :6].mean(axis=(1, 2)) + f[:, :6, 2:6].mean(axis=(1, 2)))
    assert ring[labels == 1].mean() > 1.3 * ring[labels == 0].mean()


def test_gate_harness_end_to_end_smoke():
    # one non-int8-SR mode + one int8-SR mode: exercises both the skipped
    # and built int8-SR-variant branches of run_gate's lazy construction
    modes = ("shared_trunk_f32", "int8_sr_noborder_shared_trunk_int8")
    rep = run_gate(n_images=2, size=128, clf_steps=2, edsr_steps=2,
                   verbose=False, mode_names=modes)
    assert rep["protocol"]["patch"] == 96 and rep["protocol"]["stride"] == 48
    assert {m["mode"] for m in rep["modes"]} == set(modes)
    for m in rep["modes"]:
        assert set(m) >= {"vote_agreement", "mean_abs_conf_drift", "accuracy",
                          "pred_class1_frac", "passes_gate"}
    assert "meaningful" in rep
    # only the requested int8-SR variant was built and measured
    assert rep["psnr_int8_noborder_sr_vs_f32_sr_db"] is not None
    assert rep["psnr_int8_sr_vs_f32_sr_db"] is None
