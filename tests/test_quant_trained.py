"""Trained-weight int8 validation (VERDICT r1 item 7).

Round-1 validated int8-vs-f32 agreement only on random init weights; random
activations say little about trained-model drift. Here a VGG16 classifier is
actually trained on separable synthetic defect textures, then quantized with
calibration on training patches, and the serving gate is enforced: >=99%
patch-vote decision agreement with the f32 path and bounded confidence drift.
This is the evidence that keeps BENCH_INT8=1 as the bench default.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.models import VGG16Classifier
from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                quantized_vgg16_apply)
from tpusr.train import ClassifierTrainer

pytestmark = pytest.mark.slow


def _textures(rng, n, hw, cls):
    """class 0: smooth blobs; class 1: high-frequency stripes (a crude
    low/high z-offset print-texture analog)."""
    out = np.empty((n, hw, hw, 3), np.float32)
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    for i in range(n):
        phase = rng.uniform(0, 2 * np.pi)
        if cls == 0:
            img = 0.5 + 0.3 * np.sin(2 * np.pi * (yy + xx) + phase)
        else:
            img = 0.5 + 0.4 * np.sign(np.sin(16 * np.pi * xx + phase))
        img = img + rng.normal(0, 0.03, (hw, hw))
        out[i] = np.clip(img, 0, 1)[..., None].repeat(3, axis=2)
    return out


@pytest.fixture(scope="module")
def trained_classifier():
    rng = np.random.default_rng(0)
    hw = 32
    x = np.concatenate([_textures(rng, 40, hw, 0), _textures(rng, 40, hw, 1)])
    y = np.concatenate([np.zeros(40, np.int32), np.ones(40, np.int32)])
    perm = rng.permutation(len(x))
    x, y = x[perm], y[perm]

    trainer = ClassifierTrainer(
        VGG16Classifier(num_classes=2, dropout_rate=0.0),
        learning_rate=1e-4)  # full fine-tune: reaches ~100% in 6 epochs
    res = trainer.fit(x[:64], y[:64], x[64:], y[64:], batch_size=16, epochs=6,
                      verbose=False, es_patience=10)
    ev = trainer.evaluate(res.state, x[64:], y[64:], batch_size=16)
    assert ev["accuracy"] >= 0.85, f"classifier failed to train: {ev}"
    return res.state.params, x, y


def _batched_patch_vote(clf_apply, images, patch=32, stride=16):
    """Patch-vote a whole image batch in ONE compiled call (int8 convs are
    ~10x slower on the CPU test backend; a per-image python loop would take
    minutes)."""
    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patchify, patch_grid_size
    from tpusr.pipeline.defect_pipeline import _vote

    h, w = images.shape[1:3]
    pad_h, pad_w = pad_amounts(h, w, patch, stride)
    nh, nw = patch_grid_size(h + pad_h, w + pad_w, patch, stride)

    @jax.jit
    def fn(batch):
        def per_image(img):
            x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            return patchify(x, patch, stride)

        patches = jax.vmap(per_image)(batch)
        flat = patches.reshape((-1,) + patches.shape[2:])
        probs = clf_apply(flat).reshape(batch.shape[0], nh * nw, -1)
        return jax.vmap(_vote)(probs)

    cls, conf = fn(jnp.asarray(images))
    return np.asarray(cls), np.asarray(conf)


def test_int8_trained_decision_agreement(trained_classifier):
    params, x, y = trained_classifier
    params = jax.device_get(params)

    calib = x[:16]
    q = quantize_vgg16(params, calibrate_vgg16(params, calib))

    model = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    f32_apply = lambda p: model.apply({"params": params}, p)
    int8_apply = lambda p: quantized_vgg16_apply(q, p)

    rng = np.random.default_rng(1)
    big = np.concatenate([_textures(rng, 15, 32, 0), _textures(rng, 15, 32, 1)])

    c_f, p_f = _batched_patch_vote(f32_apply, big)
    c_q, p_q = _batched_patch_vote(int8_apply, big)
    agreement = float((c_f == c_q).mean())
    mean_drift = float(np.abs(p_f - p_q).mean())
    # serving gate: >=99% decisions agree, confidence drift bounded
    assert agreement >= 0.99, f"agreement {agreement:.3f}"
    assert mean_drift <= 0.05, f"confidence drift {mean_drift:.4f}"
    # and the quantized pipeline still solves the task
    truth = np.concatenate([np.zeros(15, np.int64), np.ones(15, np.int64)])
    assert float((c_q == truth).mean()) >= 0.9


def test_int8_trained_patch_probs_close(trained_classifier):
    """Raw per-patch probabilities track f32 closely on trained weights."""
    params, x, _ = trained_classifier
    params = jax.device_get(params)
    q = quantize_vgg16(params, calibrate_vgg16(params, x[:16]))
    model = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x[:32])))
    got = np.asarray(quantized_vgg16_apply(q, jnp.asarray(x[:32])))
    assert np.abs(want - got).mean() < 0.03
    # argmax agreement on raw patches
    assert (want.argmax(-1) == got.argmax(-1)).mean() >= 0.97
