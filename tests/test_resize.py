"""Golden-parity tests: tpusr.core.resize vs cv2.resize (float32 path).

cv2 uses float arithmetic for float32 inputs, so parity should be ~1e-5.
"""

import cv2
import numpy as np
import pytest

from tpusr.core.resize import resize

CASES = [
    # (in_h, in_w, out_h, out_w)
    (32, 32, 64, 64),       # 2x upscale
    (32, 48, 128, 192),     # 4x upscale
    (37, 53, 91, 113),      # odd non-integer upscale
    (64, 64, 32, 32),       # 2x downscale
    (91, 113, 37, 53),      # odd non-integer downscale
]

CV2_FLAGS = {
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "area": cv2.INTER_AREA,
    "lanczos4": cv2.INTER_LANCZOS4,
}


@pytest.mark.parametrize("method", list(CV2_FLAGS))
@pytest.mark.parametrize("case", CASES)
def test_resize_matches_cv2_color(method, case, rng):
    in_h, in_w, out_h, out_w = case
    img = rng.random((in_h, in_w, 3), dtype=np.float32)
    want = cv2.resize(img, (out_w, out_h), interpolation=CV2_FLAGS[method])
    got = np.asarray(resize(img, (out_h, out_w), method))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


@pytest.mark.parametrize("method", list(CV2_FLAGS))
def test_resize_matches_cv2_gray(method, rng):
    img = rng.random((40, 56), dtype=np.float32) * 255.0
    want = cv2.resize(img, (112, 80), interpolation=CV2_FLAGS[method])
    got = np.asarray(resize(img, (80, 112), method))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_resize_batched_equals_loop(rng):
    imgs = rng.random((4, 24, 24, 3), dtype=np.float32)
    batched = np.asarray(resize(imgs, (48, 48), "bicubic"))
    for k in range(4):
        single = np.asarray(resize(imgs[k], (48, 48), "bicubic"))
        np.testing.assert_allclose(batched[k], single, atol=1e-6)


def test_resize_identity():
    img = np.random.default_rng(0).random((16, 16, 3), dtype=np.float32)
    out = np.asarray(resize(img, (16, 16), "bicubic"))
    np.testing.assert_allclose(out, img, atol=1e-7)
