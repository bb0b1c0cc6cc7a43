"""Serving-gate harness regression (the real gate artifact is GATE.json,
produced on the TPU by `python -m tpusr.tools.serving_gate`; this smoke
keeps the harness runnable end-to-end on the CPU mesh)."""

import numpy as np
import pytest

from tpusr.tools.serving_gate import (CASCADE_THRESHOLDS, TASKS, _compare,
                                      aggregate_runs, derive_cascade_modes,
                                      make_surface_images, run_gate)


# ------------------------- fast, pure-python layers (no training, no jit)
def _mode(name, va, flips, maxd, passes, faithful=None):
    m = {"mode": name, "vote_agreement": va, "flips": flips,
         "mean_abs_conf_drift": maxd / 2, "max_abs_conf_drift": maxd,
         "accuracy": 0.9, "pred_class1_frac": 0.5, "boundary_images": 3,
         "boundary_vote_agreement": va, "passes_gate": passes}
    if faithful is not None:
        m["image_faithful"] = faithful
    return m


def test_aggregate_runs_pass_requires_every_seed():
    runs = [
        {"seed": 0, "protocol": {"images": 128}, "reference_accuracy": 0.92,
         "reference_boundary_images": 10,
         "modes": [_mode("a", 1.0, 0, 0.05, True, faithful=True),
                   _mode("b", 1.0, 0, 0.02, True)]},
        {"seed": 1, "protocol": {"images": 128}, "reference_accuracy": 0.90,
         "reference_boundary_images": 14,
         "modes": [_mode("a", 0.98, 3, 0.30, False, faithful=False),
                   _mode("b", 0.992, 1, 0.04, True)]},
    ]
    agg = aggregate_runs(runs)
    assert agg["seeds"] == [0, 1] and agg["images_total"] == 256
    assert agg["reference_boundary_images_total"] == 24
    by = {m["mode"]: m for m in agg["modes"]}
    # mode a fails on seed 1 -> fails overall, despite passing seed 0
    assert not by["a"]["passes_gate_all_seeds"]
    assert by["a"]["min_vote_agreement"] == 0.98
    assert by["a"]["total_flips"] == 3
    assert by["a"]["max_abs_conf_drift"] == 0.30
    assert by["a"]["image_faithful_all_seeds"] is False
    assert by["b"]["passes_gate_all_seeds"]
    assert "image_faithful_all_seeds" not in by["b"]  # serves f32 SR


def test_compare_reports_boundary_slice():
    ref_cls = np.array([0, 1, 0, 1])
    ref_conf = np.array([0.99, 0.60, 0.95, 0.55])  # 2 boundary (<0.65)
    cls = np.array([0, 0, 0, 1])                   # one flip, at a boundary
    conf = np.array([0.99, 0.58, 0.90, 0.70])
    labels = np.array([0, 1, 0, 1])
    m = _compare("x", ref_cls, ref_conf, cls, conf, labels)
    assert m["flips"] == 1 and m["vote_agreement"] == 0.75
    assert m["boundary_images"] == 2
    assert m["boundary_vote_agreement"] == 0.5
    assert m["accuracy"] == 0.75


def test_derive_cascade_modes_merge_and_unescalated_flips():
    ref_cls = np.array([0, 1, 0, 1])
    ref_conf = np.array([0.95, 0.55, 0.90, 0.60])
    labels = np.array([0, 1, 0, 1])
    # trunk: flips image 1 (low trunk conf 0.55 -> escalates at T>=0.60) and
    # image 2 (HIGH trunk conf 0.95 -> never escalates: unescalated flip)
    trunk = (np.array([0, 0, 1, 1]), np.array([0.95, 0.55, 0.95, 0.58]))
    # per-patch parent: certified, agrees with the reference everywhere
    pp = (ref_cls.copy(), ref_conf.copy())
    rows = derive_cascade_modes(
        {"shared_trunk_int8": trunk, "int8_per_patch": pp},
        ref_cls, ref_conf, labels)
    assert [r["mode"] for r in rows] == [f"cascade_int8@{t:.2f}"
                                         for t in CASCADE_THRESHOLDS]
    by = {r["mode"]: r for r in rows}
    r60 = by["cascade_int8@0.60"]
    # T=0.60 escalates images 1 (0.55) and 3 (0.58): image 1's flip is
    # repaired, image 2's confident flip remains
    assert r60["escalation_fraction"] == 0.5
    assert r60["flips"] == 1 and r60["unescalated_flips"] == 1
    r90 = by["cascade_int8@0.90"]  # escalates 1 and 3 only (0.95s stay)
    assert r90["escalation_fraction"] == 0.5
    assert r90["flips"] == 1 and r90["unescalated_flips"] == 1
    # parents missing -> no derived rows
    assert derive_cascade_modes({"int8_per_patch": pp}, ref_cls, ref_conf,
                                labels) == []


def test_aggregate_runs_cascade_escalation_stats():
    base = _mode("cascade_int8@0.80", 1.0, 0, 0.05, True)
    a = dict(base, escalation_fraction=0.10, unescalated_flips=0)
    b = dict(base, escalation_fraction=0.22, unescalated_flips=1,
             vote_agreement=0.99, passes_gate=True)
    runs = [{"seed": s, "protocol": {"images": 128},
             "reference_accuracy": 0.9, "reference_boundary_images": 5,
             "modes": [m]} for s, m in ((0, a), (1, b))]
    agg = aggregate_runs(runs)
    m = agg["modes"][0]
    assert m["max_escalation_fraction"] == 0.22
    assert m["total_unescalated_flips"] == 1


def test_task_presets():
    assert set(TASKS) == {"easy", "hard"}
    for t in TASKS.values():
        lo, hi = t["amp_range"]
        assert 0.0 < lo < hi and t["noise"] > 0
        clo, chi = t["coverage_range"]
        assert 0.0 < clo <= chi <= 1.0
    # easy = full coverage (perfectly separable); hard dips well below the
    # 50% vote threshold so some defect images get minority striped votes
    assert TASKS["easy"]["coverage_range"] == (1.0, 1.0)
    assert TASKS["hard"]["coverage_range"][0] < 0.5


def test_partial_coverage_masks_stripes():
    import jax.numpy as jnp
    full, labels_f = make_surface_images(3, 8, 128, coverage_range=(1.0, 1.0))
    part, labels_p = make_surface_images(3, 8, 128, coverage_range=(0.3, 0.4))
    assert np.array_equal(np.asarray(labels_f), np.asarray(labels_p))
    lab = np.asarray(labels_f)
    # same PRNG stream: backgrounds/noise identical, only the stripe band
    # differs -> class-1 images differ on a strict subset of pixels
    df = np.abs(np.asarray(full) - np.asarray(part)).max(axis=(1, 2, 3))
    assert (df[lab == 0] == 0).all()
    changed = np.abs(np.asarray(full) - np.asarray(part)) > 1e-6
    frac = changed.any(-1).mean(axis=(1, 2))
    # low coverage: the partial image keeps stripes on <~half the area, so
    # the diff region (masked-out stripes) covers a majority-but-not-all band
    assert (frac[lab == 1] > 0.2).all() and (frac[lab == 1] < 0.95).all()


# ------------------------------ slow: real training through the harness
@pytest.mark.slow
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


@pytest.mark.slow
def test_gate_harness_end_to_end_smoke():
    # one non-int8-SR mode + one int8-SR mode: exercises both the skipped
    # and built int8-SR-variant branches of run_gate's lazy construction
    modes = ("shared_trunk_f32", "int8_sr_noborder_shared_trunk_int8")
    rep = run_gate(n_images=2, size=128, clf_steps=2, edsr_steps=2,
                   verbose=False, mode_names=modes)
    assert rep["protocol"]["patch"] == 96 and rep["protocol"]["stride"] == 48
    assert {m["mode"] for m in rep["modes"]} == set(modes)
    for m in rep["modes"]:
        assert set(m) >= {"vote_agreement", "flips", "mean_abs_conf_drift",
                          "accuracy", "pred_class1_frac", "passes_gate",
                          "boundary_images"}
    assert "meaningful" in rep
    # only the requested int8-SR variant was built and measured
    assert rep["psnr_int8_noborder_sr_vs_f32_sr_db"] is not None
    assert rep["ssim_int8_noborder_sr_vs_f32_sr"] is not None
    assert rep["psnr_int8_sr_vs_f32_sr_db"] is None
    # the SR-modifying mode carries the image-fidelity verdict
    nb = next(m for m in rep["modes"]
              if m["mode"] == "int8_sr_noborder_shared_trunk_int8")
    assert "sr_psnr_vs_f32_db" in nb and "image_faithful" in nb
    assert rep["gate_standard"]["min_image_faithful_psnr_db"] == 35.0
