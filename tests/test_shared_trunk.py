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


@pytest.mark.slow  # 59s; int8 agreement also covered by test_quant + GATE.json, f32 exactness stays quick
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


def test_fused_pipeline_trunk_probs_matches_per_patch():
    """FusedSRClassifyPipeline(trunk_probs=...) must produce the same votes
    as the per-patch pipeline when the kernels make the two paths exact
    (center-tap-only), wiring the shared trunk into the public API."""
    from tpusr.pipeline.defect_pipeline import FusedSRClassifyPipeline

    m, params = _center_only_params(seed=6)
    clf_apply = lambda p: m.apply({"params": params}, p)
    from tpusr.models.vgg_trunk import shared_trunk_probs_f32
    trunk = lambda imgs: shared_trunk_probs_f32(params, imgs, PATCH, STRIDE)
    up = lambda x: jnp.clip(jax.image.resize(
        x, (x.shape[0], 96, 96, 3), "bilinear"), 0.0, 1.0)

    pipe_pp = FusedSRClassifyPipeline(up, clf_apply=clf_apply, lr_hw=(48, 48),
                                      scale=2, patch=PATCH, stride=STRIDE)
    pipe_tr = FusedSRClassifyPipeline(up, trunk_probs=trunk, lr_hw=(48, 48),
                                      scale=2, patch=PATCH, stride=STRIDE)
    lr = jnp.asarray(np.random.default_rng(7).random((2, 48, 48, 3),
                                                     dtype=np.float32))
    sr_a, cls_a, conf_a = pipe_pp(lr)
    sr_b, cls_b, conf_b = pipe_tr(lr)
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_allclose(np.asarray(conf_a), np.asarray(conf_b),
                               atol=1e-5)

    with pytest.raises(ValueError, match="exactly one"):
        FusedSRClassifyPipeline(up, clf_apply=clf_apply, trunk_probs=trunk,
                                lr_hw=(48, 48), scale=2)
    with pytest.raises(ValueError, match="exactly one"):
        FusedSRClassifyPipeline(up, lr_hw=(48, 48), scale=2)


def _serving_fixture(seed=8):
    from tpusr.models import EDSR as EDSRModule

    rng = np.random.default_rng(seed)
    edsr = EDSRModule(scale_factor=4, num_res_blocks=1, num_filters=8)
    ev = edsr.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    _m, params = _center_only_params(seed=9)
    calib_lr = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    calib_patches = jnp.asarray(rng.random((4, PATCH, PATCH, 3),
                                           dtype=np.float32))
    lr = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    return ev["params"], params, calib_lr, calib_patches, lr


def test_make_serving_pipeline_f32_modes():
    """The serving factory's f32 modes run and agree with each other
    (center-only kernels -> per-patch == shared-trunk exactly)."""
    from tpusr.pipeline.defect_pipeline import make_serving_pipeline

    e_params, c_params, calib_lr, calib_patches, lr = _serving_fixture()
    results = {}
    for clf_mode in ("per_patch_f32", "shared_trunk_f32"):
        pipe = make_serving_pipeline(
            e_params, c_params, (24, 24), 4, patch=PATCH, stride=STRIDE,
            sr_mode="f32", clf_mode=clf_mode)
        sr, cls, conf = pipe(lr)
        assert sr.shape == (2, 96, 96, 3) and cls.shape == (2,)
        results[clf_mode] = np.asarray(cls)
    np.testing.assert_array_equal(results["per_patch_f32"],
                                  results["shared_trunk_f32"])

    with pytest.raises(ValueError, match="calib_lr"):
        make_serving_pipeline(e_params, c_params, (24, 24), 4,
                              sr_mode="int8", clf_mode="per_patch_f32")
    with pytest.raises(ValueError, match="calib_patches"):
        make_serving_pipeline(e_params, c_params, (24, 24), 4, sr_mode="f32",
                              clf_mode="per_patch_int8")
    with pytest.raises(ValueError, match="clf_mode"):
        make_serving_pipeline(e_params, c_params, (24, 24), 4,
                              sr_mode="f32", clf_mode="nope")


@pytest.mark.slow  # int8 convs on the CPU test mesh are slow
def test_make_serving_pipeline_quantized_modes():
    """int8/bf16 serving combinations build and run end to end."""
    from tpusr.pipeline.defect_pipeline import make_serving_pipeline

    e_params, c_params, calib_lr, calib_patches, lr = _serving_fixture()
    for sr_mode, clf_mode in (("int8", "shared_trunk_int8"),
                              ("bf16", "per_patch_int8")):
        pipe = make_serving_pipeline(
            e_params, c_params, (24, 24), 4, patch=PATCH, stride=STRIDE,
            sr_mode=sr_mode, clf_mode=clf_mode, calib_lr=calib_lr,
            calib_patches=calib_patches)
        sr, cls, conf = pipe(lr)
        assert sr.shape == (2, 96, 96, 3) and cls.shape == (2,)
        assert np.isfinite(np.asarray(conf)).all()


def test_shared_trunk_nonsquare_and_multiclass():
    """Non-square images and >2 classes go through the same alignment
    machinery exactly (center-tap kernels -> per-patch equality)."""
    m, params = _center_only_params(seed=10, num_classes=3)
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.random((1, 96, 144, 3), dtype=np.float32))

    got = np.asarray(shared_trunk_probs_f32(params, imgs, PATCH, STRIDE))
    patches = _reference_patches(imgs[0], PATCH, STRIDE)
    want = np.asarray(m.apply({"params": params}, patches))
    assert got.shape[2] == 3
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_shared_trunk_nonoverlapping_stride():
    """stride == patch (96/96, non-overlapping grid) also aligns: stride
    multiple of 16, patch multiple of 32."""
    m, params = _center_only_params(seed=12)
    rng = np.random.default_rng(13)
    imgs = jnp.asarray(rng.random((1, 96, 96, 3), dtype=np.float32))
    got = np.asarray(shared_trunk_probs_f32(params, imgs, PATCH, stride=96))
    patches = _reference_patches(imgs[0], PATCH, 96)
    want = np.asarray(m.apply({"params": params}, patches))
    assert got.shape[1] == patches.shape[0]  # 1 patch per dim here
    np.testing.assert_allclose(got[0], want, atol=1e-5)
