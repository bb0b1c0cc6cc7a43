"""Lifecycle-facade tests: the reference-shaped API surface works end to end
(setup -> fit -> evaluate -> super_resolve/classify -> save -> reload)."""

import numpy as np
import pytest

from tpusr.models.api import SRCNNModel, EDSR, ESRGAN, FineTunedVGG16


@pytest.fixture(scope="module")
def sr_pairs():
    rng = np.random.default_rng(0)
    y = rng.random((48, 24, 24, 3), dtype=np.float32)
    x = 0.5 * (y + np.roll(y, 1, axis=1))
    return x, y


def test_srcnn_facade_lifecycle(sr_pairs, tmp_path):
    x, y = sr_pairs
    m = SRCNNModel()
    with pytest.raises(RuntimeError):
        SRCNNModel().evaluate(x, y)  # untrained guard
    m.setup_model(input_shape=(24, 24, 3))
    history, tt, mt = m.fit(x[:32], y[:32], x[32:], y[32:], batch_size=16,
                            epochs=2)
    assert len(history["loss"]) <= 2
    loss, psnr, ssim = m.evaluate(x[32:], y[32:])
    assert np.isfinite(psnr)
    lr = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
    sr, metrics = m.super_resolve_image(lr, hr_h=32, hr_w=32, patch_size=24,
                                        stride=12)
    assert sr.shape == (32, 32, 3)
    assert metrics["time_sec"] > 0
    path = m.save(str(tmp_path), "test")

    m2 = SRCNNModel()
    m2.setup_model(input_shape=(24, 24, 3), from_pretrained=True,
                   pretrained_path=path)
    l2 = m2.evaluate(x[32:], y[32:])
    assert abs(l2[0] - loss) < 1e-6  # restored weights give identical loss


def test_edsr_facade_lifecycle(sr_pairs):
    rng = np.random.default_rng(2)
    y = rng.random((24, 16, 16, 3), dtype=np.float32)
    x = y[:, ::2, ::2, :]
    m = EDSR()
    m.setup_model(scale_factor=2, num_res_blocks=2, learning_rate=1e-3)
    history, tt, mt = m.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8,
                            epochs=2)
    m.evaluate(x[16:], y[16:])
    lr = rng.random((20, 20, 3)).astype(np.float32)
    sr, _ = m.super_resolve_image(lr, patch_size_lr=8, stride=4)
    assert sr.shape == (40, 40, 3)


@pytest.mark.slow  # e2e GAN facade (79s); the GAN step itself is covered in test_train
def test_esrgan_facade_lifecycle():
    rng = np.random.default_rng(3)
    y = rng.random((8, 16, 16, 3), dtype=np.float32)
    x = y[:, ::2, ::2, :]
    m = ESRGAN()
    m.setup_model(scale_factor=2, growth_channels=4, num_rrdb_blocks=1,
                  input_shape=(8, 8, 3), output_shape=(16, 16, 3))
    losses, tt, mt = m.fit(x, y, epochs=1, batch_size=4)
    assert "g_loss" in losses
    ev = m.evaluate(x, y, batch_size=4)
    assert set(ev) == {"avg_psnr", "avg_ssim", "avg_g_loss"}
    sr, _ = m.super_resolve_image(x[0], patch_size_lr=8, stride=4)
    assert sr.shape == (16, 16, 3)
    assert 0.0 <= sr.min() and sr.max() <= 1.0
    sr_full, fm = m.super_resolve_full_image(x[0], attention_block_size=16)
    assert sr_full.shape == (16, 16, 3) and "time_sec" in fm
    assert 0.0 <= sr_full.min() and sr_full.max() <= 1.0


@pytest.mark.slow  # two full ESRGAN trainer inits + orbax round trip (~2.5 min)
def test_esrgan_sidecar_restores_output_geometry(tmp_path):
    """Reloading an x4 checkpoint with default (x2) setup args must restore
    BOTH the scale and the SR output geometry — a stale output_shape would
    mis-size the exported discriminator (cli convert regression)."""
    m = ESRGAN()
    m.setup_model(scale_factor=4, growth_channels=4, num_rrdb_blocks=1,
                  input_shape=(8, 8, 3), output_shape=(32, 32, 3))
    m.trained = True
    m.save(str(tmp_path), "t0")
    m2 = ESRGAN()
    m2.setup_model(input_shape=(8, 8, 3), from_trained=True,
                   generator_pretrained_path=str(tmp_path / "ESRGAN_x4_t0"))
    assert m2.scale_factor == 4
    assert m2.output_shape == (32, 32, 3)


@pytest.mark.slow  # 36s real-size VGG16; facade machinery stays quick via the SRCNN/EDSR lifecycles, VGG16 trainer semantics via test_trainer_semantics
def test_vgg16_facade_lifecycle(tmp_path):
    rng = np.random.default_rng(4)
    x0 = rng.random((16, 32, 32, 3), dtype=np.float32) * 0.3
    x1 = rng.random((16, 32, 32, 3), dtype=np.float32) * 0.3 + 0.7
    x = np.concatenate([x0, x1]).astype(np.float32)
    y = np.array([0] * 16 + [1] * 16)
    m = FineTunedVGG16()
    m.setup_model(input_shape=(32, 32, 3), num_classes=2)
    history = m.fit(x[:24], y[:24], x[24:], y[24:], batch_size=8, epochs=2,
                    use_augmentation=True)
    assert "accuracy" in history
    loss, acc = m.evaluate(x[24:], y[24:])
    cls, conf = m.classify_defects_method(
        rng.random((48, 48, 3)).astype(np.float32))
    assert cls in (0, 1) and 0.0 <= conf <= 1.0
    m.save(str(tmp_path), "test")


def test_augmentation_shapes():
    from tpusr.models.api import augment_classification_set
    x = np.random.default_rng(0).random((6, 16, 16, 3)).astype(np.float32)
    y = np.arange(6) % 2
    xa, ya = augment_classification_set(x, y)
    assert xa.shape == (12, 16, 16, 3)
    assert (ya[:6] == ya[6:]).all()
    # augmented copies differ from originals
    assert not np.allclose(xa[:6], xa[6:])
