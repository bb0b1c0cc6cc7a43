"""int8 VGG16 quantization: probabilities and patch-vote decisions must track
the f32 reference closely."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import VGG16Classifier
from tpusr.models.quant import calibrate_vgg16, quantize_vgg16, quantized_vgg16_apply


@pytest.mark.slow  # 41s (two full real-size VGG16 compiles); int8 fidelity stays quick via test_edsr_quant, and the protocol-scale trained-weight gate is GATE.json (tools/serving_gate.py)
def test_quantized_probs_track_f32():
    rng = np.random.default_rng(0)
    m = VGG16Classifier(num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    calib = rng.random((16, 32, 32, 3)).astype(np.float32)
    scales = calibrate_vgg16(v["params"], calib)
    q = quantize_vgg16(v["params"], scales)

    x = rng.random((32, 32, 32, 3)).astype(np.float32)
    p_f32 = np.asarray(m.apply(v, jnp.asarray(x)))
    p_q = np.asarray(quantized_vgg16_apply(q, jnp.asarray(x)))
    assert p_q.shape == p_f32.shape
    np.testing.assert_allclose(p_q.sum(-1), 1.0, atol=1e-5)
    # decisions should agree on a strong majority of patches
    agree = (p_f32.argmax(-1) == p_q.argmax(-1)).mean()
    assert agree >= 0.9, agree
    # probabilities should be close in aggregate
    assert np.abs(p_f32 - p_q).mean() < 0.05
