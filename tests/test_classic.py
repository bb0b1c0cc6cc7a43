"""Parity tests for the classic SR algorithms against cv2/numpy re-statements
of the reference (classic_algorithms.py)."""

import cv2
import numpy as np
import pytest

from tpusr.classic import (
    back_projection, edge_guided_interpolation, frequency_extrapolation,
    non_local_means, estimate_sigma,
)
from tpusr.classic.harness import run_classic_comparison, CLASSIC_ALGORITHMS


@pytest.fixture(scope="module")
def gray_pair():
    rng = np.random.default_rng(21)
    hr = (rng.random((64, 80)) * 255).astype(np.float32)
    hr = cv2.GaussianBlur(hr, (5, 5), 1.2)  # structured content
    lr = cv2.resize(hr, (40, 32), interpolation=cv2.INTER_AREA)
    return hr, lr


def ref_back_projection(hr_image, lr_image, iterations=10):
    hr = hr_image.astype(np.float32).copy()
    for _ in range(iterations):
        down = cv2.resize(hr, (lr_image.shape[1], lr_image.shape[0]),
                          interpolation=cv2.INTER_LINEAR)
        diff = lr_image.astype(np.float32) - down
        diff_up = cv2.resize(diff, (hr.shape[1], hr.shape[0]),
                             interpolation=cv2.INTER_LINEAR)
        hr += diff_up
    return np.clip(hr, 0, 255)


def test_back_projection_matches_reference(gray_pair):
    hr, lr = gray_pair
    hr0 = cv2.resize(lr, (hr.shape[1], hr.shape[0]), interpolation=cv2.INTER_LINEAR)
    want = ref_back_projection(hr0, lr, 10)
    got = np.asarray(back_projection(hr0, lr, 10))
    np.testing.assert_allclose(got, want, atol=1e-2)


def ref_edge_guided(ground_truth, image):
    grad_x = cv2.Sobel(image, cv2.CV_64F, 1, 0)
    grad_y = cv2.Sobel(image, cv2.CV_64F, 0, 1)
    edges = np.hypot(grad_x, grad_y)
    upscaled = cv2.resize(image.astype(np.uint8),
                          (ground_truth.shape[1], ground_truth.shape[0]),
                          interpolation=cv2.INTER_LINEAR)
    up_edges = cv2.resize(edges, (upscaled.shape[1], upscaled.shape[0]))
    sharpened = cv2.addWeighted(upscaled.astype(np.float32), 1.0,
                                up_edges.astype(np.float32), 0.3, 0)
    return np.clip(sharpened, 0, 255)


def test_edge_guided_matches_reference(gray_pair):
    hr, lr = gray_pair
    lr_u8 = np.round(lr).astype(np.uint8).astype(np.float32)
    want = ref_edge_guided(hr, lr_u8)
    got = np.asarray(edge_guided_interpolation(hr, lr_u8))
    # uint8 rounding in the reference's upscale can flip borderline pixels by 1
    # cv2's uint8 path uses 11-bit fixed-point bilinear coefficients; ours is
    # float. Borderline pixels flip by 1/255 — bound count and magnitude.
    np.testing.assert_allclose(got, want, atol=1.02)
    assert np.abs(got - want).mean() < 0.15


def ref_frequency_extrapolation(ground_truth, image):
    f = np.fft.fft2(image)
    fshift = np.fft.fftshift(f)
    rows, cols = image.shape
    pad_rows, pad_cols = ground_truth.shape
    f_padded = np.zeros((pad_rows, pad_cols), dtype=complex)
    row_start = pad_rows // 2 - rows // 2
    col_start = pad_cols // 2 - cols // 2
    f_padded[row_start:row_start + rows, col_start:col_start + cols] = fshift
    return np.abs(np.fft.ifft2(np.fft.ifftshift(f_padded)))


def test_frequency_extrapolation_matches_reference(gray_pair):
    hr, lr = gray_pair
    want = ref_frequency_extrapolation(hr, lr)
    got = np.asarray(frequency_extrapolation(hr, lr))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


def test_estimate_sigma_tracks_noise_level():
    rng = np.random.default_rng(5)
    base = np.zeros((96, 96), np.float32) + 0.5
    for true_sigma in (0.02, 0.05, 0.10):
        noisy = base + rng.normal(0, true_sigma, base.shape).astype(np.float32)
        est = float(estimate_sigma(noisy))
        assert abs(est - true_sigma) / true_sigma < 0.25, (true_sigma, est)


def test_nlm_denoises():
    # piecewise-smooth content (NLM's regime): gradient background + square
    yy, xx = np.mgrid[0:40, 0:48]
    clean01 = (0.3 + 0.4 * xx / 48).astype(np.float32)
    clean01[12:28, 16:32] = 0.8
    hr = np.zeros((80, 96), np.float32)  # target size only
    rng = np.random.default_rng(9)
    noisy01 = np.clip(clean01 + rng.normal(0, 0.05, clean01.shape), 0, 1).astype(np.float32)
    out = np.asarray(non_local_means(hr, noisy01))
    assert out.shape == hr.shape
    assert out.min() > -0.2 and out.max() < 1.2
    # denoised upscale should beat noisy upscale against the clean upscale
    from tpusr.core.resize import resize
    up_clean = np.asarray(resize(clean01, hr.shape, "lanczos4"))
    up_noisy = np.asarray(resize(noisy01, hr.shape, "lanczos4"))
    mse_out = np.mean((out - up_clean) ** 2)
    mse_noisy = np.mean((up_noisy - up_clean) ** 2)
    assert mse_out < 0.5 * mse_noisy, (mse_out, mse_noisy)


def test_harness_smoke():
    rng = np.random.default_rng(33)
    hr_images, lr_images = [], []
    for _ in range(2):
        hr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        hr = cv2.GaussianBlur(hr, (3, 3), 1.0)
        lr = cv2.resize(hr, (24, 24), interpolation=cv2.INTER_AREA)
        hr_images.append(hr)
        lr_images.append(lr)
    summary, ranked, scores, stats = run_classic_comparison(hr_images, lr_images)
    assert set(summary) == set(CLASSIC_ALGORITHMS)
    for alg in CLASSIC_ALGORITHMS:
        assert np.isfinite(summary[alg]["psnr_mean"]), alg
        assert summary[alg]["time_mean"] > 0
    assert len(ranked) == 8
    # the reference's quirk: NLM's [0,1]-vs-[0,255] scoring buries it
    assert summary["nlm"]["psnr_mean"] < 10.0
    # interpolators should score reasonably on smooth content
    assert summary["bicubic"]["psnr_mean"] > 20.0
