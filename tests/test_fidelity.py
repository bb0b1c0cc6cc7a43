"""BASELINE fidelity criterion, executable: with identical weights, the fused
TPU inference pipelines must match a faithful numpy restatement of the
reference's host pipelines (pad -> patch loop -> predict -> overlap-add) to
well within the 1e-3 PSNR/SSIM budget — we require ~1e-5 pixel agreement."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import SRCNN, EDSR, VGG16Classifier
from tpusr.pipeline import super_resolve_image, srcnn_super_resolve, classify_defects
from tpusr.metrics import psnr, ssim


def ref_add_padding(image, patch_size, stride):
    h, w, _ = image.shape
    pad_h = (patch_size - (h % stride)) % stride if h % stride != 0 else 0
    pad_w = (patch_size - (w % stride)) % stride if w % stride != 0 else 0
    pad_h = max(pad_h, patch_size - stride)
    pad_w = max(pad_w, patch_size - stride)
    return np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect"), (h, w)


def ref_patches(image, patch, stride):
    h, w, _ = image.shape
    ps, pos = [], []
    for i in range(0, h - patch + 1, stride):
        for j in range(0, w - patch + 1, stride):
            ps.append(image[i:i + patch, j:j + patch, :])
            pos.append((i, j))
    return np.asarray(ps, np.float32), pos


def ref_reconstruct(hr_patches, positions, padded_lr_shape, orig_lr_shape,
                    patch_lr, scale):
    h_pad, w_pad = padded_lr_shape[:2]
    h0, w0 = orig_lr_shape
    p_hr = patch_lr * scale
    recon = np.zeros((h_pad * scale, w_pad * scale, 3), np.float32)
    weight = np.zeros_like(recon)
    for patch, (i, j) in zip(hr_patches, positions):
        hi, hj = i * scale, j * scale
        recon[hi:hi + p_hr, hj:hj + p_hr] += patch
        weight[hi:hi + p_hr, hj:hj + p_hr] += 1.0
    recon = np.divide(recon, weight, out=np.zeros_like(recon), where=weight != 0)
    return np.clip(recon[: h0 * scale, : w0 * scale], 0.0, 1.0)


def test_edsr_fused_pipeline_matches_reference_flow():
    m = EDSR(scale_factor=2, num_res_blocks=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    apply_fn = lambda p: m.apply(v, p)

    rng = np.random.default_rng(0)
    lr = rng.random((50, 61, 3)).astype(np.float32)

    # reference flow (EDSR_model.py:189-315), with the same flax net as "predict"
    padded, orig = ref_add_padding(lr, 24, 12)
    patches, positions = ref_patches(padded, 24, 12)
    preds = np.asarray(apply_fn(jnp.asarray(patches)))
    want = ref_reconstruct(preds, positions, padded.shape, orig, 24, 2)

    got, _ = super_resolve_image(apply_fn, lr, patch_size_lr=24, stride=12, scale=2)
    got = np.asarray(got)

    np.testing.assert_allclose(got, want, atol=1e-5)
    assert float(psnr(jnp.asarray(want), jnp.asarray(got))) > 80.0
    assert float(ssim(jnp.asarray(want), jnp.asarray(got))) > 0.999


def test_srcnn_fused_pipeline_matches_reference_flow():
    m = SRCNN(f1=8, f2=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    apply_fn = lambda p: m.apply(v, p)

    rng = np.random.default_rng(1)
    lr = rng.random((25, 30, 3)).astype(np.float32)
    hr_h, hr_w = 50, 60

    # reference flow (SRCNN_model.py:111-247): cv2 pre-upscale then same-size SR
    up = np.clip(cv2.resize(lr, (hr_w, hr_h), interpolation=cv2.INTER_CUBIC), 0, 1)
    padded, orig = ref_add_padding(up, 24, 12)
    patches, positions = ref_patches(padded, 24, 12)
    preds = np.asarray(apply_fn(jnp.asarray(patches)))
    want = ref_reconstruct(preds, positions, padded.shape, orig, 24, 1)

    got, _ = srcnn_super_resolve(apply_fn, lr, hr_h, hr_w, patch_size=24,
                                 stride=12, interpolation="bicubic")
    got = np.asarray(got)

    # cv2 vs tpusr resize agree to ~2e-5; through 3 convs stays ~1e-4
    np.testing.assert_allclose(got, want, atol=5e-4)
    assert float(psnr(jnp.asarray(want), jnp.asarray(got))) > 70.0


def test_classify_matches_reference_flow():
    # pad/patch/vote flow parity is network-independent; a tiny conv head
    # keeps this in the quick loop (the full VGG16 classifier is exercised
    # against the reference flow in test_shared_trunk / test_quant_trained)
    import flax.linen as nn

    class TinyClf(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(8, (3, 3))(x))
            x = x.mean(axis=(1, 2))
            return nn.softmax(nn.Dense(2)(x))

    m = TinyClf()
    v = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    clf = lambda p: m.apply(v, p)

    rng = np.random.default_rng(3)
    img = rng.random((70, 90, 3)).astype(np.float32)

    # reference flow (VGG16_model.py:168-270)
    padded, _ = ref_add_padding(img, 32, 16)
    patches, _ = ref_patches(padded, 32, 16)
    probs = np.asarray(clf(jnp.asarray(patches)))
    votes = np.bincount(np.argmax(probs, 1), minlength=2)
    top = np.where(votes == votes.max())[0]
    want_cls = int(top[0]) if len(top) == 1 else int(
        top[np.argmax(probs.mean(0)[top])])
    want_conf = float(probs[:, want_cls].mean())

    got_cls, got_conf = classify_defects(clf, img, patch=32, stride=16)
    assert got_cls == want_cls
    assert abs(got_conf - want_conf) < 1e-5
