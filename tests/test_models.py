"""Model-architecture parity tests: parameter counts must match the
reference's executed notebook outputs (BASELINE.md), plus shape/range checks
and a tf.nn.depth_to_space golden for pixel_shuffle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import (
    SRCNN, EDSR, ESRGANGenerator, ESRGANDiscriminator,
    VGG16Classifier, VGG19Features, pixel_shuffle,
)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_srcnn_param_count_and_shape():
    m = SRCNN()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    assert n_params(v["params"]) == 28931  # SRCNN.ipynb cell 4
    y = m.apply(v, jnp.zeros((2, 24, 24, 3)))
    assert y.shape == (2, 24, 24, 3)


def test_edsr_param_count_and_upscale():
    m = EDSR(scale_factor=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    assert n_params(v["params"]) == 1369859  # EDSR.ipynb cell 4
    y = m.apply(v, jnp.zeros((2, 24, 24, 3)))
    assert y.shape == (2, 48, 48, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_edsr_x4_shape():
    m = EDSR(scale_factor=4, num_res_blocks=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    y = m.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_esrgan_generator_param_count():
    # conv/attention params are input-size-independent: init + forward at
    # 8x8 (not the notebook's 24x24) — same 1,162,915 count, ~3x less
    # CPU-compile in the quick loop
    m = ESRGANGenerator(scale_factor=2, growth_channels=8, num_rrdb_blocks=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert n_params(v["params"]) == 1162915  # ESRGAN.ipynb cell 6
    y = m.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 16, 16, 3)
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0


def test_esrgan_discriminator_param_count():
    m = ESRGANDiscriminator()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    # keras summary's 659,266 total = 658,305 trainable + 961 spectral-u slots
    # (GAP head: params are input-size-independent, so init small)
    assert n_params(v["params"]) == 658305
    assert n_params(v["spectral"]) == 961
    y = m.apply(v, jnp.zeros((2, 16, 16, 3)))
    assert y.shape == (2, 1)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_discriminator_spectral_update():
    m = ESRGANDiscriminator()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    y, mut = m.apply(v, jnp.ones((1, 24, 24, 3)), True, mutable=["spectral"])
    before = jax.tree.leaves(v["spectral"])[0]
    after = jax.tree.leaves(mut["spectral"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vgg16_classifier_param_count():
    m = VGG16Classifier(num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    assert n_params(v["params"]) == 14846530  # VGG16.ipynb cell 6
    y = m.apply(v, jnp.zeros((3, 96, 96, 3)))
    assert y.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-6)


def test_vgg19_features_param_count():
    m = VGG19Features()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    assert n_params(v["params"]) == 20024384  # ESRGAN.ipynb cell 6
    y = m.apply(v, jnp.zeros((1, 48, 48, 3)))
    assert y.shape == (1, 3, 3, 512)  # 48 / 2^4 = 3, stops inside block5


def test_pixel_shuffle_matches_tf():
    import tensorflow as tf
    rng = np.random.default_rng(3)
    x = rng.random((2, 4, 5, 12), dtype=np.float32)
    want = tf.nn.depth_to_space(x, 2).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got, want)


def test_self_attention_shape_preserving():
    from tpusr.models import SelfAttention
    m = SelfAttention(64)
    x = jnp.ones((1, 6, 6, 64))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_esrgan_x4_generator_shapes():
    m = ESRGANGenerator(scale_factor=4, growth_channels=4, num_rrdb_blocks=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    y = m.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 32, 32, 3)  # two x2 pixel-shuffle stages


def test_spectral_norm_gradient_stops_through_uv():
    """Keras/TFA SpectralNormalization parity: gradients flow through W only
    — u and v are stop_gradient'ed, so d(sigma)/dW == outer(v, u) exactly
    (regression: differentiating through the power iteration deviates D
    gradients from the reference every train step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpusr.models.layers import SNDense

    m = SNDense(features=3)
    x = jnp.asarray(np.random.default_rng(0).random((2, 5), np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    params, spectral = variables["params"], variables["spectral"]
    u = np.asarray(spectral["u"])  # (1, out)
    w = np.asarray(params["kernel"])  # (in, out)

    # reference formulation: v, u from one power iteration, then constants
    v = u @ w.T
    v = v / np.linalg.norm(v)
    u1 = v @ w
    u1 = u1 / np.linalg.norm(u1)
    sigma = float(v @ w @ u1.T)

    def out_sum(kernel):
        # apply returns x @ (W/sigma) + b; grad of sum(apply(eye)) w.r.t. W
        # isolates d(W/sigma)/dW
        return m.apply({"params": {**params, "kernel": kernel},
                        "spectral": spectral}, jnp.eye(5)).sum()

    g = jax.grad(out_sum)(jnp.asarray(w))
    # analytic: d/dW [sum(eye @ W/sigma)] with sigma = v W u^T, u/v constant:
    # = ones_out/sigma (through W) - (sum(W)/sigma^2) * outer(v, u1)
    ones = np.ones((5, 3), np.float32)
    expected = ones / sigma - (w / sigma).sum() / sigma * (v.T @ u1)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-5)
