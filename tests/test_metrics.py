"""Golden-parity tests for tpusr.metrics against tf.image and the reference's
numpy formulas (profiling_methods.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # slow: tf.image golden oracles

from tpusr.metrics import (
    psnr, ssim, mae, rmse, sobel_mag, gradient_mse, epi,
    hf_energy_ratio, kl_divergence, kl_divergence_color,
    bootstrap_ci, compute_summary_stats, rank_algorithms,
)


@pytest.fixture(scope="module")
def tf():
    import tensorflow as tf  # CPU oracle only
    return tf


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    a = rng.random((4, 48, 48, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_psnr_matches_tf(tf, pair):
    a, b = pair
    want = tf.image.psnr(a, b, max_val=1.0).numpy()
    got = np.asarray(psnr(a, b))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_matches_tf(tf, pair):
    a, b = pair
    want = tf.image.ssim(a, b, max_val=1.0).numpy()
    got = np.asarray(ssim(a, b))
    np.testing.assert_allclose(got, want, atol=1e-3)   # BASELINE budget: 1e-3
    np.testing.assert_allclose(got, want, atol=2e-5)   # actual parity is much tighter


def test_ssim_identical_images_is_one(pair):
    a, _ = pair
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-6)


def test_mae_rmse_match_reference(pair):
    a, b = pair
    want_mae = float(np.mean(np.abs(a - b)))
    want_rmse = float(np.sqrt(np.mean((a - b) ** 2) + 1e-9))
    assert abs(float(mae(a, b)) - want_mae) < 1e-6
    assert abs(float(rmse(a, b)) - want_rmse) < 1e-6


def test_sobel_matches_cv2():
    import cv2
    rng = np.random.default_rng(3)
    g = rng.random((32, 40), dtype=np.float32)
    gx = cv2.Sobel(g, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(g, cv2.CV_32F, 0, 1, ksize=3)
    want = np.sqrt(gx * gx + gy * gy)
    got = np.asarray(sobel_mag(g))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gradient_mse_and_epi_sane():
    rng = np.random.default_rng(5)
    hr = rng.random((32, 32), dtype=np.float32)
    assert abs(float(gradient_mse(hr, hr))) < 1e-10
    assert abs(float(epi(hr, hr)) - 1.0) < 1e-6


def test_hf_energy_ratio_reference_formula():
    rng = np.random.default_rng(11)
    hr = rng.random((40, 40)).astype(np.float32)
    sr = rng.random((40, 40)).astype(np.float32)
    # reference formula (profiling_methods.py:98-114)
    F_hr = np.fft.fftshift(np.fft.fft2(hr))
    F_sr = np.fft.fftshift(np.fft.fft2(sr))
    h, w = hr.shape
    cy, cx = h // 2, w // 2
    Y, X = np.ogrid[:h, :w]
    r = np.sqrt((Y - cy) ** 2 + (X - cx) ** 2)
    mask = r > 0.6 * (r.max() + 1e-9)
    want = (np.abs(F_sr)[mask].sum() + 1e-9) / (np.abs(F_hr)[mask].sum() + 1e-9)
    got = float(hf_energy_ratio(hr, sr))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _np_kl(p_img, q_img, bins):
    p_arr = np.clip(p_img, 0, 1) * 255.0
    q_arr = np.clip(q_img, 0, 1) * 255.0
    p_hist, _ = np.histogram(p_arr, bins=bins, range=(0, 255), density=True)
    q_hist, _ = np.histogram(q_arr, bins=bins, range=(0, 255), density=True)
    P, Q = p_hist + 1e-12, q_hist + 1e-12
    return float(np.sum(P * np.log(P / Q)))


def test_kl_divergence_matches_numpy():
    rng = np.random.default_rng(13)
    p = rng.random((64, 64)).astype(np.float32)
    q = np.clip(p + rng.normal(0, 0.1, p.shape).astype(np.float32), 0, 1)
    np.testing.assert_allclose(float(kl_divergence(p, q)), _np_kl(p, q, 256), atol=1e-4)


def test_kl_color_matches_numpy():
    rng = np.random.default_rng(17)
    p = rng.random((32, 32, 3)).astype(np.float32)
    q = np.clip(p + rng.normal(0, 0.1, p.shape).astype(np.float32), 0, 1)
    want = np.mean([_np_kl(p[..., c], q[..., c], 64) for c in range(3)])
    np.testing.assert_allclose(float(kl_divergence_color(p, q)), want, atol=1e-4)


def test_bootstrap_ci_contains_mean():
    rng = np.random.default_rng(19)
    vals = rng.normal(10.0, 1.0, 200)
    lo, hi = bootstrap_ci(vals)
    assert lo < vals.mean() < hi
    assert hi - lo < 1.0
    assert bootstrap_ci([1.0]) == (pytest.approx(np.nan, nan_ok=True),) * 2


def test_summary_and_ranking_schema():
    stats = compute_summary_stats([1.0, 2.0, 3.0])
    assert stats["mean"] == 2.0 and stats["count"] == 3
    summary = {
        "fast_good": {"psnr_mean": 30.0, "ssim_mean": 0.9, "time_mean": 0.1, "memory_mean": 1.0},
        "slow_bad": {"psnr_mean": 20.0, "ssim_mean": 0.5, "time_mean": 1.0, "memory_mean": 2.0},
    }
    ranked, scores, bounds = rank_algorithms(
        summary,
        maximize=["psnr_mean", "ssim_mean"],
        minimize=["time_mean", "memory_mean"],
        weights={"psnr_mean": 0.25, "ssim_mean": 0.25, "time_mean": 0.25, "memory_mean": 0.25},
    )
    assert ranked[0][0] == "fast_good"
    assert scores["fast_good"] == pytest.approx(1.0)
    assert scores["slow_bad"] == pytest.approx(0.0)
