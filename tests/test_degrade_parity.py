"""Degradation-model parity: the jittable blur stages must match cv2's
GaussianBlur / filter2D used by the reference (common_methods.py:51-100)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from tpusr.data.degrade import _gauss_kernel1d, _sep_blur


def test_gauss_kernel_matches_cv2():
    for k in (3, 5, 7):
        for sigma in (0.8, 1.4, 2.0):
            want = cv2.getGaussianKernel(k, sigma).ravel()
            got = np.asarray(_gauss_kernel1d(k, sigma))
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_sep_blur_matches_cv2_gaussian():
    rng = np.random.default_rng(0)
    img = (rng.random((32, 40, 3)) * 255).astype(np.float32)
    for k, sigma in ((3, 0.9), (5, 1.5), (7, 2.0)):
        want = cv2.GaussianBlur(img, (k, k), sigmaX=sigma)
        kk = _gauss_kernel1d(k, sigma)
        got = np.asarray(_sep_blur(jnp.asarray(img), kk, kk))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)


def test_motion_blur_matches_cv2_filter2d():
    rng = np.random.default_rng(1)
    img = (rng.random((24, 24, 3)) * 255).astype(np.float32)
    for size in (5, 7, 9):
        kern = np.zeros((size, size), np.float32)
        kern[(size - 1) // 2, :] = 1.0 / size
        want = cv2.filter2D(img, -1, kern)
        got = np.asarray(_sep_blur(jnp.asarray(img),
                                   jnp.asarray([1.0]),
                                   jnp.full((size,), 1.0 / size)))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)
