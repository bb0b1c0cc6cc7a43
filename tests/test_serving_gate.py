"""Serving-gate harness regression (the real gate artifact is GATE.json,
produced on the TPU by `python -m tpusr.tools.serving_gate`; this smoke
keeps the harness runnable end-to-end on the CPU mesh)."""

import numpy as np
import pytest

from tpusr.tools.serving_gate import (CASCADE_FRACS, CASCADE_THRESHOLDS,
                                      TASKS, _compare, aggregate_runs,
                                      cascade_rank_analysis,
                                      derive_cascade_modes,
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
    assert [r["mode"] for r in rows[:len(CASCADE_THRESHOLDS)]] == [
        f"cascade_int8@{t:.2f}" for t in CASCADE_THRESHOLDS]
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
    # without trunk_scores the static-frac rows still derive for 'conf'
    assert [r["mode"] for r in rows if "@frac=" in r["mode"]] == [
        f"cascade_int8[conf]@frac={f}" for f in CASCADE_FRACS]


def test_derive_cascade_frac_rows_rank_by_score():
    """The static top-K rows must escalate exactly the K lowest-scored
    images per score — conf and vote_frac rank DIFFERENT images here, so
    the rows repair different flips."""
    ref_cls = np.array([0, 1, 0, 1])
    ref_conf = np.array([0.9, 0.9, 0.9, 0.9])
    labels = ref_cls
    # trunk flips images 0 and 3. conf ranks image 3 lowest (0.51) but
    # image 0 HIGH (0.80); vote_frac ranks image 0 lowest (0.4 patch
    # agreement) and image 3 next (0.6) -> at frac=0.5 (k=2):
    #   conf escalates {3, 1(0.70)} -> flip 0 survives
    #   vote_frac escalates {0, 3} -> zero unescalated flips
    trunk = (np.array([1, 1, 0, 0]), np.array([0.80, 0.70, 0.95, 0.51]))
    scores = {"vote_frac": np.array([0.4, 0.9, 1.0, 0.6])}
    pp = (ref_cls.copy(), ref_conf.copy())
    rows = derive_cascade_modes(
        {"shared_trunk_int8": trunk, "int8_per_patch": pp},
        ref_cls, ref_conf, labels, trunk_scores=scores, n_patches=10)
    by = {r["mode"]: r for r in rows}
    assert by["cascade_int8[conf]@frac=0.5"]["unescalated_flips"] == 1
    assert by["cascade_int8[vote_frac]@frac=0.5"]["unescalated_flips"] == 0
    assert by["cascade_int8[vote_frac]@frac=0.5"]["flips"] == 0
    # frac=0.25 (k=1) escalates only the single lowest: conf -> image 3,
    # vote_frac -> image 0; one flip survives either way
    assert by["cascade_int8[conf]@frac=0.25"]["unescalated_flips"] == 1
    assert by["cascade_int8[vote_frac]@frac=0.25"]["unescalated_flips"] == 1


def test_cascade_rank_analysis_flip_ranks():
    ref_cls = np.array([0, 1, 0, 1])
    trunk = (np.array([1, 1, 0, 0]),                # flips at 0 and 3
             np.array([0.80, 0.70, 0.95, 0.51]))
    scores = {"vote_frac": np.array([0.4, 0.9, 1.0, 0.6]),
              "mean_margin": np.array([0.9, 0.8, 0.7, 0.6])}
    out = cascade_rank_analysis({"shared_trunk_int8": trunk}, ref_cls,
                                scores, n_patches=10)
    assert out["trunk_flips"] == 2 and out["n_images"] == 4
    s = out["scores"]
    # conf ascending: [3(0.51), 1(0.70), 0(0.80), 2(0.95)] -> flips at 0, 2
    assert s["conf"]["flip_ranks"] == [0, 2]
    assert s["conf"]["min_zero_flip_escalation_frac"] == 0.75
    # vote_frac lex ascending: [0(0.4), 3(0.6), 1(0.9), 2(1.0)] -> 0, 1
    assert s["vote_frac+conf"]["flip_ranks"] == [0, 1]
    assert s["vote_frac+conf"]["min_zero_flip_escalation_frac"] == 0.5
    # mean_margin ascending: [3, 2, 1, 0] -> flips at ranks 0 and 3
    assert s["mean_margin"]["flip_ranks"] == [0, 3]
    assert s["mean_margin"]["min_zero_flip_escalation_frac"] == 1.0
    # no trunk scores -> no analysis
    assert cascade_rank_analysis({"shared_trunk_int8": trunk}, ref_cls,
                                 None) is None


def test_vote_scores_matches_numpy():
    import jax
    import jax.numpy as jnp

    from tpusr.tools.serving_gate import _vote_scores

    rng = np.random.default_rng(7)
    p1 = rng.random((5, 100, 1)).astype(np.float32)
    probs = np.concatenate([1.0 - p1, p1], axis=-1)
    cls, conf, vf, mm = jax.vmap(_vote_scores)(jnp.asarray(probs))
    preds = probs.argmax(-1)
    for i in range(5):
        want_vf = (preds[i] == int(cls[i])).mean()
        want_mm = np.abs(probs[i, :, 1] - probs[i, :, 0]).mean()
        np.testing.assert_allclose(float(vf[i]), want_vf, atol=1e-6)
        np.testing.assert_allclose(float(mm[i]), want_mm, atol=1e-6)


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


def test_gate_merge_grafts_new_modes_and_checks_shared():
    from tpusr.tools.gate_merge import MergeError, merge_reports

    def report(modes, seed=0, extra=None):
        r = {"seed": seed, "protocol": {"images": 4}, "training": {"s": 1},
             "reference_accuracy": 0.9, "reference_boundary_images": 1,
             "modes": [dict(m) for m in modes]}
        r.update(extra or {})
        return r

    shared = _mode("int8_per_patch", 1.0, 0, 0.01, True)
    casc = dict(_mode("cascade_int8@0.80", 1.0, 0, 0.02, True),
                escalation_fraction=0.1, unescalated_flips=0)
    task = {"name": "hard"}
    full = {"task": task, "runs": [report([shared])]}
    sub = {"task": task,
           "runs": [report([shared, casc],
                           extra={"raw_votes": {"reference": {}}})]}
    merged = merge_reports(full, sub)
    assert [m["mode"] for m in merged["runs"][0]["modes"]] == [
        "int8_per_patch", "cascade_int8@0.80"]
    assert merged["runs"][0]["raw_votes"] == {"reference": {}}
    assert merged["merged_from"][0]["modes_added"] == ["cascade_int8@0.80"]
    agg = {m["mode"]: m for m in merged["aggregate"]["modes"]}
    assert agg["cascade_int8@0.80"]["total_unescalated_flips"] == 0

    # a shared mode that does NOT reproduce must refuse to merge
    bad = dict(shared, flips=2, vote_agreement=0.5)
    with pytest.raises(MergeError):
        merge_reports({"task": task, "runs": [report([shared])]},
                      {"task": task, "runs": [report([bad])]})
    # task mismatch refuses
    with pytest.raises(MergeError):
        merge_reports({"task": {"name": "easy"}, "runs": []},
                      {"task": task, "runs": []})


def test_gate_merge_enriches_raw_votes_and_run_fields():
    """A subset run's extra raw-vote keys (trunk ranking scores), run-level
    rank analyses, and SR-drift scalars graft into the full report; shared
    raw-vote keys that DISAGREE refuse the merge."""
    from tpusr.tools.gate_merge import MergeError, merge_reports

    shared = _mode("int8_per_patch", 1.0, 0, 0.01, True)
    task = {"name": "hard"}

    def report(extra=None):
        r = {"seed": 0, "protocol": {"images": 4}, "training": {"s": 1},
             "reference_accuracy": 0.9, "reference_boundary_images": 1,
             "modes": [dict(shared)],
             "psnr_bf16_sr_vs_f32_sr_db": None}
        r.update(extra or {})
        return r

    full = {"task": task, "runs": [report(
        {"raw_votes": {"shared_trunk_int8": {"cls": [0, 1]}}})]}
    sub = {"task": task, "runs": [report(
        {"raw_votes": {"shared_trunk_int8": {"cls": [0, 1],
                                             "vote_frac": [0.5, 1.0]}},
         "psnr_bf16_sr_vs_f32_sr_db": 55.2,
         "bf16_sr_cascade_int8_rank_analysis": {"n_images": 4}})]}
    merged = merge_reports(full, sub)
    fr = merged["runs"][0]
    assert fr["raw_votes"]["shared_trunk_int8"]["vote_frac"] == [0.5, 1.0]
    assert fr["psnr_bf16_sr_vs_f32_sr_db"] == 55.2
    assert fr["bf16_sr_cascade_int8_rank_analysis"] == {"n_images": 4}

    conflict = {"task": task, "runs": [report(
        {"raw_votes": {"shared_trunk_int8": {"cls": [1, 1]}}})]}
    with pytest.raises(MergeError):
        merge_reports(
            {"task": task, "runs": [report(
                {"raw_votes": {"shared_trunk_int8": {"cls": [0, 1]}}})]},
            conflict)


def test_gate_merge_append_seeds():
    """Independent-seed accumulation: new-seed runs append whole; duplicate
    seeds are skipped; protocol mismatch refuses; per-mode seed support is
    recorded in the aggregate."""
    from tpusr.tools.gate_merge import MergeError, merge_seed_runs

    shared = _mode("int8_per_patch", 1.0, 0, 0.01, True)
    task = {"name": "hard"}

    def report(seed, images=4):
        return {"seed": seed, "protocol": {"images": images},
                "training": {"s": 1}, "reference_accuracy": 0.9,
                "reference_boundary_images": 1, "modes": [dict(shared)]}

    full = {"task": task, "runs": [report(0), report(1)]}
    extra = {"task": task, "runs": [report(1), report(3)]}
    merged = merge_seed_runs(full, extra)
    assert [r["seed"] for r in merged["runs"]] == [0, 1, 3]
    assert merged["merged_from"][-1]["seeds_added"] == [3]
    m = merged["aggregate"]["modes"][0]
    assert m["seeds"] == [0, 1, 3]
    assert m["passes_gate_all_seeds"]

    with pytest.raises(MergeError):
        merge_seed_runs({"task": task, "runs": [report(0)]},
                        {"task": task, "runs": [report(7, images=8)]})
    with pytest.raises(MergeError):
        merge_seed_runs({"task": {"name": "easy"}, "runs": [report(0)]},
                        {"task": task, "runs": [report(7)]})


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
