"""Smoke tests: every comparison panel renders to a PNG from the summary schema."""

import os

import numpy as np
import pytest

from tpusr.metrics.stats import build_metrics_summary


@pytest.fixture(scope="module")
def summary():
    rng = np.random.default_rng(0)
    algs = ["bilinear", "bicubic", "ibp"]
    mk = lambda lo, hi: {a: list(rng.uniform(lo, hi, 5)) for a in algs}
    return build_metrics_summary(
        mk(0.001, 0.01), mk(1e6, 5e6), mk(20, 35), mk(0.5, 0.95), mk(1, 5),
        mk(2, 8), mk(0.001, 0.01), mk(0.8, 1.2), mk(0.7, 1.3), mk(0.05, 0.5),
        mk(0.05, 0.5))


COLORS = {"bilinear": "#4c72b0", "bicubic": "#55a868", "ibp": "#ccb974"}
ALGS = ["bilinear", "bicubic", "ibp"]


def test_classic_panels_render(summary, tmp_path):
    from tpusr.viz import (
        plot_time_memory_panels, plot_psnr_ssim_panels,
        plot_speed_quality_tradeoff_3d, plot_error_metrics_grid,
        plot_edge_metrics_grid, plot_frequency_distribution_metrics_grid,
        show_algorithm_ranking,
    )
    out = tmp_path / "panels"
    plot_time_memory_panels(summary, ALGS, COLORS, "t/m", out / "tm.png")
    plot_psnr_ssim_panels(summary, ALGS, COLORS, "q", out / "q.png")
    plot_speed_quality_tradeoff_3d(summary, ALGS, COLORS, results_dir=out)
    plot_error_metrics_grid(summary, ALGS, COLORS, results_dir=out)
    plot_edge_metrics_grid(summary, ALGS, COLORS, results_dir=out)
    plot_frequency_distribution_metrics_grid(summary, ALGS, COLORS, results_dir=out)
    ranked, scores = show_algorithm_ranking(
        summary, maximize=["psnr_mean", "ssim_mean"],
        minimize=["time_mean", "memory_mean"],
        weights={"psnr_mean": .4, "ssim_mean": .4, "time_mean": .1, "memory_mean": .1},
        results_dir=out, colors_map=COLORS)
    assert len(ranked) == 3
    pngs = list(out.glob("*.png"))
    assert len(pngs) >= 7
    assert all(p.stat().st_size > 1000 for p in pngs)


def test_example_grids_render(tmp_path):
    from tpusr.viz import (plot_and_save_super_resolution_example,
                           plot_and_save_ssim_similarity_maps)
    rng = np.random.default_rng(1)
    hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    lr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    up = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    g = (rng.random((32, 32)) * 255).astype(np.uint8)
    lg = (rng.random((16, 16)) * 255).astype(np.uint8)
    vis = (hr, lr, up, up, up, up)
    plot_and_save_super_resolution_example(vis, (g, lg, g), (g, g), (g, lg, g),
                                           (g, g), tmp_path)
    plot_and_save_ssim_similarity_maps(vis, (g, lg, g), (g, g), (g, lg, g),
                                       (g, g), tmp_path)
    assert (tmp_path / "sr_examples.png").exists()
    assert (tmp_path / "ssim_maps.png").exists()


def test_dl_panels_render(tmp_path):
    from tpusr.viz import (plot_sr_metrics, plot_sr_time, plot_sr_memory,
                           plot_classification_reports_panel, plot_4x3,
                           plot_confidence_panel)
    rng = np.random.default_rng(2)
    models = ["srcnn", "edsr", "esrgan"]
    mpm = {m: {
        "train_loss": rng.random(), "val_loss": rng.random(), "eval_loss": rng.random(),
        "train_psnr": 30 + rng.random(), "val_psnr": 30.0, "eval_psnr": 29.0,
        "train_ssim": 0.8, "val_ssim": 0.8, "eval_ssim": 0.8,
        "train_epoch_time_sec": 40.0, "inference_time_sec": 0.5,
        "train_mem_mean_mb": 900.0, "train_mem_peak_mb": 1200.0,
        "inference_mem_mean_mb": 400.0, "inference_mem_peak_mb": 600.0,
    } for m in models}
    plot_sr_metrics(models, mpm, save_dir=tmp_path)
    plot_sr_time(models, mpm, save_dir=tmp_path)
    plot_sr_memory(models, mpm, save_dir=tmp_path)

    y = rng.integers(0, 2, 40)
    preds = [np.where(rng.random(40) < 0.8, y, 1 - y) for _ in models]
    confs = [rng.uniform(0.5, 1.0, 40) for _ in models]
    reports = plot_classification_reports_panel(y, models, preds,
                                                class_names=["low_z", "high_z"],
                                                save_dir=tmp_path)
    assert set(reports) == set(models)
    assert 0 <= reports["srcnn"]["accuracy"] <= 1

    imgs = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(12)]
    plot_4x3(imgs, titles=[f"i{k}" for k in range(12)], save_dir=tmp_path)
    stats = plot_confidence_panel(y, models, preds, confs, save_dir=tmp_path)
    assert len(stats) == 3
    assert len(list(tmp_path.glob("*.png"))) >= 7
