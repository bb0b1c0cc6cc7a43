"""ESRGAN generator .h5 import: build the reference generator architecture in
Keras (RRDB + SAGAN self-attention + pixel-shuffle upsampling, per
ESRGAN_model.py:212-345), save, import into the tpusr flax generator, and
require matching outputs at fp32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
from tensorflow import keras  # noqa: E402

from tpusr.models import ESRGANGenerator  # noqa: E402
from tpusr.train.keras_import import import_esrgan_generator  # noqa: E402


class KerasSelfAttention(keras.layers.Layer):
    """Keras twin of the reference's SelfAttention (ESRGAN_model.py:30-79)."""

    def __init__(self, channels, **kwargs):
        super().__init__(**kwargs)
        self.channels = channels

    def build(self, input_shape):
        self.f = keras.layers.Conv2D(self.channels // 8, 1, padding="same",
                                     name=self.name + "_f")
        self.g = keras.layers.Conv2D(self.channels // 8, 1, padding="same",
                                     name=self.name + "_g")
        self.h = keras.layers.Conv2D(self.channels // 2, 1, padding="same",
                                     name=self.name + "_h")
        self.v = keras.layers.Conv2D(self.channels, 1, padding="same",
                                     name=self.name + "_v")
        super().build(input_shape)

    def call(self, x):
        f = self.f(x)
        g = self.g(x)
        h = self.h(x)
        sf = tf.shape(f)
        f_flat = tf.reshape(f, [sf[0], -1, tf.shape(f)[-1]])
        g_flat = tf.reshape(g, [sf[0], -1, tf.shape(g)[-1]])
        h_flat = tf.reshape(h, [sf[0], -1, tf.shape(h)[-1]])
        beta = tf.nn.softmax(tf.matmul(g_flat, f_flat, transpose_b=True), axis=-1)
        o = tf.reshape(tf.matmul(beta, h_flat), tf.shape(h))
        return x + self.v(o)


def build_keras_generator(scale=2, growth=4, n_rrdb=1, filters=8):
    def dense_block(x, name):
        inp = x
        cin = x.shape[-1]
        feats = [x]
        for k in range(1, 5):
            inz = feats[0] if len(feats) == 1 else keras.layers.Concatenate()(feats)
            feats.append(keras.layers.Conv2D(growth, 3, padding="same",
                                             activation="relu",
                                             name=f"{name}_conv{k}")(inz))
        x5 = keras.layers.Conv2D(cin, 3, padding="same", name=f"{name}_conv5")(
            keras.layers.Concatenate()(feats))
        x5 = keras.layers.Lambda(lambda t: t * 0.2)(x5)
        return keras.layers.Add()([inp, x5])

    inp = keras.Input(shape=(None, None, 3), name="lr_input")
    x = keras.layers.Conv2D(filters, 3, padding="same", name="initial_conv")(inp)
    trunk = x
    for i in range(n_rrdb):
        blk_in = x
        for j in (1, 2, 3):
            x = dense_block(x, f"rrdb_{i}_dense{j}")
        x = keras.layers.Lambda(lambda t: t * 0.2)(x)
        x = keras.layers.Add()([blk_in, x])
    x = keras.layers.Conv2D(filters, 3, padding="same", name="trunk_conv")(x)
    x = keras.layers.Add()([trunk, x])
    x = KerasSelfAttention(filters, name="self_attention_trunk")(x)
    for i in range(int(np.log2(scale))):
        x = keras.layers.Conv2D(filters * 4, 3, padding="same",
                                name=f"upsample_{i}_conv")(x)
        x = keras.layers.Lambda(lambda t: tf.nn.depth_to_space(t, 2))(x)
        x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
        if i == 0:
            x = KerasSelfAttention(filters, name="self_attention_upsample_0")(x)
    x = keras.layers.Conv2D(filters, 3, padding="same", activation="relu",
                            name="final_conv1")(x)
    out = keras.layers.Conv2D(3, 3, padding="same", activation="tanh",
                              name="final_conv2")(x)
    return keras.Model(inp, out)


def test_esrgan_generator_h5_output_parity(tmp_path):
    km = build_keras_generator()
    path = str(tmp_path / "gen.h5")
    km.save(path)

    m = ESRGANGenerator(scale_factor=2, growth_channels=4, num_rrdb_blocks=1,
                        base_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    params = import_esrgan_generator(v["params"], path)

    x = (np.random.default_rng(0).random((2, 8, 8, 3), dtype=np.float32)
         * 2.0 - 1.0)
    want = km(x).numpy()
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_esrgan_generator_wrong_rrdb_in_flax_differs(tmp_path):
    """Sanity: parity above is not vacuous — with the initializer weights
    (no import) outputs must differ."""
    km = build_keras_generator()
    path = str(tmp_path / "gen.h5")
    km.save(path)
    m = ESRGANGenerator(scale_factor=2, growth_channels=4, num_rrdb_blocks=1,
                        base_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = np.random.default_rng(0).random((1, 8, 8, 3), dtype=np.float32)
    want = km(x).numpy()
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    assert not np.allclose(got, want, atol=1e-3)
