"""Shared-trunk classifier tests.

The ONLY numeric difference between the shared trunk and the reference
per-patch path is SAME-conv padding at patch borders. Zeroing every
non-center kernel tap removes that difference entirely (padded values are
multiplied by zero), so with center-only kernels the two paths must agree
EXACTLY — which pins down all the pool-alignment / dilated-GAP / strided
sampling logic in tpusr.models.vgg_trunk. Context-vs-zero-pad drift with
real kernels is measured by the protocol-scale serving gate instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import patchify
from tpusr.models import VGG16Classifier
from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                quantized_vgg16_apply)
from tpusr.models.vgg_trunk import (shared_trunk_probs_f32,
                                    shared_trunk_probs_int8, trunk_geometry)

PATCH, STRIDE = 96, 48


def _center_only_params(seed=0, num_classes=2):
    """VGG16Classifier params with all non-center conv taps zeroed."""
    m = VGG16Classifier(num_classes=num_classes, dropout_rate=0.0)
    v = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, PATCH, PATCH, 3)))
    params = jax.device_get(v["params"])
    bb = params["vgg16"]
    for name, lp in bb.items():
        k = np.asarray(lp["kernel"])
        masked = np.zeros_like(k)
        masked[1, 1] = k[1, 1] * 3.0  # keep useful magnitude
        lp["kernel"] = jnp.asarray(masked)
    return m, params


def _reference_patches(img, patch, stride):
    """The reference protocol's patch extraction (VGG16_model.py:216-242):
    reflect-pad, sliding window."""
    h, w, _ = img.shape
    pad_h, pad_w = pad_amounts(h, w, patch, stride)
    padded = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    return patchify(padded, patch, stride)


def test_trunk_geometry_matches_reference_grid():
    pad_h, pad_w, n_h, n_w = trunk_geometry(512, 512, PATCH, STRIDE)
    assert (pad_h, pad_w) == (48, 48)
    assert (n_h, n_w) == (10, 10)  # the protocol's 100 patches per image
    with pytest.raises(ValueError):
        trunk_geometry(512, 512, 96, 40)
    with pytest.raises(ValueError):
        trunk_geometry(512, 512, 80, 48)


def test_shared_trunk_exact_vs_per_patch_f32():
    m, params = _center_only_params()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))

    got = np.asarray(shared_trunk_probs_f32(params, imgs, PATCH, STRIDE))
    for i in range(imgs.shape[0]):
        patches = _reference_patches(imgs[i], PATCH, STRIDE)
        want = np.asarray(m.apply({"params": params}, patches))
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_shared_trunk_exact_vs_per_patch_int8():
    # 96x96 image (2x2 patch grid) — int8 convs on the CPU test mesh are
    # slow; the f32 twin covers the larger 128x128 geometry
    _m, params = _center_only_params(seed=2)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((1, 96, 96, 3), dtype=np.float32))
    calib = rng.random((4, PATCH, PATCH, 3)).astype(np.float32)
    q = quantize_vgg16(params, calibrate_vgg16(params, calib))

    got = np.asarray(shared_trunk_probs_int8(q, imgs, PATCH, STRIDE))
    for i in range(imgs.shape[0]):
        patches = _reference_patches(imgs[i], PATCH, STRIDE)
        want = np.asarray(quantized_vgg16_apply(q, patches))
        # identical int8 trunk values -> identical f32 head -> exact probs
        np.testing.assert_allclose(got[i], want, atol=1e-6)


@pytest.mark.slow  # int8 CPU convs are slow (95s); property also holds in the exactness test path
def test_shared_trunk_prequantized_input_matches():
    """int8 path accepts pre-quantized input (the fused pipeline quantizes
    before padding) and must match the [0,1] float entry point."""
    from tpusr.models.quant import quantize_input

    _m, params = _center_only_params(seed=4)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    calib = rng.random((4, PATCH, PATCH, 3)).astype(np.float32)
    q = quantize_vgg16(params, calibrate_vgg16(params, calib))
    a = np.asarray(shared_trunk_probs_int8(q, imgs, PATCH, STRIDE))
    b = np.asarray(shared_trunk_probs_int8(q, quantize_input(q, imgs),
                                           PATCH, STRIDE))
    np.testing.assert_array_equal(a, b)
