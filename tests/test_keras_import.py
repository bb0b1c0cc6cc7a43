"""Logit-parity tests: build the reference architectures in Keras (TF CPU),
save .h5, import the weights into the tpusr flax models, and require matching
outputs at fp32 — the BASELINE parity criterion made executable."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # slow: TF golden-oracle suite

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tpusr.models import SRCNN, EDSR, VGG16Classifier
from tpusr.train.keras_import import (
    import_srcnn, import_edsr, import_vgg16_classifier,
)


def _save(model, tmp_path, name):
    path = str(tmp_path / name)
    model.save(path)
    return path


def test_srcnn_h5_logit_parity(tmp_path):
    from tensorflow import keras

    km = keras.Sequential([
        keras.layers.InputLayer(input_shape=(24, 24, 3)),
        keras.layers.Conv2D(96, (9, 9), activation="relu", padding="same"),
        keras.layers.Conv2D(32, (1, 1), activation="relu", padding="same"),
        keras.layers.Conv2D(3, (5, 5), activation="linear", padding="same"),
    ])
    path = _save(km, tmp_path, "srcnn.h5")

    m = SRCNN()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    params = import_srcnn(v["params"], path)

    x = np.random.default_rng(0).random((4, 24, 24, 3), dtype=np.float32)
    want = km(x).numpy()
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_edsr_h5_logit_parity(tmp_path):
    from tensorflow import keras

    n_blocks, nf, scale = 3, 16, 2
    inp = keras.Input(shape=(None, None, 3))
    x = keras.layers.Conv2D(nf, 3, padding="same")(inp)
    head = x
    for _ in range(n_blocks):
        sc = x
        x = keras.layers.Conv2D(nf, 3, padding="same", activation="relu")(x)
        x = keras.layers.Conv2D(nf, 3, padding="same")(x)
        x = keras.layers.Lambda(lambda t: t * 0.1)(x)
        x = keras.layers.Add()([x, sc])
    x = keras.layers.Conv2D(nf, 3, padding="same")(x)
    x = keras.layers.Add()([x, head])
    x = keras.layers.Conv2D(nf * 4, 3, padding="same")(x)
    x = keras.layers.Lambda(lambda t: tf.nn.depth_to_space(t, 2))(x)
    x = keras.layers.Conv2D(3, 3, padding="same")(x)
    out = keras.layers.Lambda(lambda t: tf.clip_by_value(t, 0.0, 1.0))(x)
    km = keras.Model(inp, out)
    path = _save(km, tmp_path, "edsr.h5")

    m = EDSR(scale_factor=scale, num_res_blocks=n_blocks, num_filters=nf)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    params = import_edsr(v["params"], path, num_res_blocks=n_blocks,
                         scale_factor=scale)

    x_in = np.random.default_rng(1).random((2, 8, 8, 3), dtype=np.float32)
    want = km(x_in).numpy()
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x_in)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vgg16_h5_logit_parity(tmp_path):
    from tensorflow import keras

    base = keras.applications.VGG16(include_top=False, weights=None,
                                    input_shape=(32, 32, 3))
    inp = keras.Input(shape=(32, 32, 3))
    x = base(inp, training=False)
    x = keras.layers.GlobalAveragePooling2D()(x)
    x = keras.layers.Dense(256, activation="relu")(x)
    out = keras.layers.Dense(2, activation="softmax", name="predictions")(x)
    km = keras.Model(inp, out)
    path = _save(km, tmp_path, "vgg16.h5")

    m = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = import_vgg16_classifier(v["params"], path)

    x_in = np.random.default_rng(2).random((3, 32, 32, 3), dtype=np.float32)
    want = km(x_in).numpy()
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x_in)))
    np.testing.assert_allclose(got, want, atol=2e-5)
