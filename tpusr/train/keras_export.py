"""Keras ``.h5`` checkpoint exporters — the inverse of ``keras_import``.

The reference ecosystem's native artifact format is a full Keras model
``.h5`` for all five networks (``SRCNN_model.py:249-259``,
``EDSR_model.py:317-330``, ``ESRGAN_model.py:981-996``,
``VGG16_model.py:272-281``, reloaded via ``load_model(custom_objects=...)``).
These exporters rebuild each reference architecture as a Keras twin (layer
names matching what ``keras_import`` expects), copy the tpusr flax weights
in, and ``model.save(path)`` — so a tpusr-trained model round-trips back
into the reference/Keras toolchain, and flax -> h5 -> flax is bit-exact
(tests/test_keras_export.py).

TensorFlow is imported lazily; nothing here runs on the TPU path.
"""

from __future__ import annotations

import numpy as np
import jax


def _np(a):
    return np.asarray(jax.device_get(a), np.float32)


# ----------------------------------------------------------- architectures
def _keras_util_layers():
    """Serializable twins of the reference's Lambda layers (x0.1/x0.2 scale,
    depth_to_space, clip) — Lambdas capturing the tf module cannot be saved
    to .h5, so the exported models use these named layers instead."""
    import tensorflow as tf
    from tensorflow import keras

    class Scale(keras.layers.Layer):
        def __init__(self, factor=1.0, **kwargs):
            super().__init__(**kwargs)
            self.factor = factor

        def call(self, x):
            return x * self.factor

        def get_config(self):
            cfg = super().get_config()
            cfg["factor"] = self.factor
            return cfg

    class DepthToSpace(keras.layers.Layer):
        def __init__(self, block_size=2, **kwargs):
            super().__init__(**kwargs)
            self.block_size = block_size

        def call(self, x):
            return tf.nn.depth_to_space(x, self.block_size)

        def get_config(self):
            cfg = super().get_config()
            cfg["block_size"] = self.block_size
            return cfg

    class ClipZeroOne(keras.layers.Layer):
        def call(self, x):
            return tf.clip_by_value(x, 0.0, 1.0)

    return Scale, DepthToSpace, ClipZeroOne


def edsr_custom_objects():
    """custom_objects for keras.models.load_model of exported EDSR files."""
    scale, d2s, clip = _keras_util_layers()
    return {"Scale": scale, "DepthToSpace": d2s, "ClipZeroOne": clip}

def build_keras_srcnn(f1=96, f2=32, k1=9, k2=1, k3=5, channels=3):
    """Reference SRCNN (SRCNN_model.py:45-53): Conv f1 (9x9) relu ->
    Conv f2 (1x1) relu -> Conv channels (5x5) linear, all SAME."""
    from tensorflow import keras

    return keras.Sequential([
        keras.layers.InputLayer(input_shape=(None, None, channels)),
        keras.layers.Conv2D(f1, (k1, k1), activation="relu", padding="same",
                            name="conv1"),
        keras.layers.Conv2D(f2, (k2, k2), activation="relu", padding="same",
                            name="conv2"),
        keras.layers.Conv2D(channels, (k3, k3), activation="linear",
                            padding="same", name="conv3"),
    ])


def build_keras_edsr(scale=2, num_res_blocks=16, num_filters=64, channels=3,
                     res_scaling=0.1):
    """Reference EDSR (EDSR_model.py:96-125): head -> N res blocks (no BN,
    x0.1) -> body + global skip -> depth_to_space upsample tail -> conv ->
    clip [0,1]."""
    from tensorflow import keras

    Scale, DepthToSpace, ClipZeroOne = _keras_util_layers()
    inp = keras.Input(shape=(None, None, channels))
    x = keras.layers.Conv2D(num_filters, 3, padding="same", name="head")(inp)
    head = x
    for i in range(num_res_blocks):
        sc = x
        x = keras.layers.Conv2D(num_filters, 3, padding="same",
                                activation="relu", name=f"res{i}_conv1")(x)
        x = keras.layers.Conv2D(num_filters, 3, padding="same",
                                name=f"res{i}_conv2")(x)
        x = Scale(res_scaling)(x)
        x = keras.layers.Add()([x, sc])
    x = keras.layers.Conv2D(num_filters, 3, padding="same", name="body")(x)
    x = keras.layers.Add()([x, head])
    n_up = 2 if scale == 4 else 1
    r = 2 if scale in (2, 4) else scale
    for i in range(n_up):
        x = keras.layers.Conv2D(num_filters * r * r, 3, padding="same",
                                name=f"up{i}")(x)
        x = DepthToSpace(r)(x)
    x = keras.layers.Conv2D(channels, 3, padding="same", name="tail")(x)
    out = ClipZeroOne()(x)
    return keras.Model(inp, out)


def _keras_self_attention_cls():
    import tensorflow as tf
    from tensorflow import keras

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
            beta = tf.nn.softmax(tf.matmul(g_flat, f_flat, transpose_b=True),
                                 axis=-1)
            o = tf.reshape(tf.matmul(beta, h_flat), tf.shape(h))
            return x + self.v(o)

        def get_config(self):
            cfg = super().get_config()
            cfg["channels"] = self.channels
            return cfg

    return KerasSelfAttention


def esrgan_custom_objects():
    """custom_objects for keras.models.load_model of exported ESRGAN files —
    the reference loads with the same pattern (ESRGAN_model.py:143-149)."""
    from tensorflow import keras

    scale, d2s, clip = _keras_util_layers()
    return {"KerasSelfAttention": _keras_self_attention_cls(),
            "SpectralNormalization": keras.layers.SpectralNormalization,
            "Scale": scale, "DepthToSpace": d2s, "ClipZeroOne": clip}


def build_keras_esrgan_generator(scale=2, growth=32, n_rrdb=23, filters=64,
                                 channels=3):
    """Reference RRDBNet generator (ESRGAN_model.py:303-345), layer names as
    the importer expects: initial_conv, rrdb_{i}_dense{j}_conv{k},
    trunk_conv, self_attention_*, upsample_{i}_conv, final_conv1/2."""
    from tensorflow import keras

    KerasSelfAttention = _keras_self_attention_cls()
    Scale, DepthToSpace, _clip = _keras_util_layers()

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
        x5 = Scale(0.2)(x5)
        return keras.layers.Add()([inp, x5])

    inp = keras.Input(shape=(None, None, channels), name="lr_input")
    x = keras.layers.Conv2D(filters, 3, padding="same", name="initial_conv")(inp)
    trunk = x
    for i in range(n_rrdb):
        blk_in = x
        for j in (1, 2, 3):
            x = dense_block(x, f"rrdb_{i}_dense{j}")
        x = Scale(0.2)(x)
        x = keras.layers.Add()([blk_in, x])
    x = keras.layers.Conv2D(filters, 3, padding="same", name="trunk_conv")(x)
    x = keras.layers.Add()([trunk, x])
    x = KerasSelfAttention(filters, name="self_attention_trunk")(x)
    for i in range(int(np.log2(scale))):
        x = keras.layers.Conv2D(filters * 4, 3, padding="same",
                                name=f"upsample_{i}_conv")(x)
        x = DepthToSpace(2)(x)
        x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
        if i == 0:
            x = KerasSelfAttention(filters, name="self_attention_upsample_0")(x)
    x = keras.layers.Conv2D(filters, 3, padding="same", activation="relu",
                            name="final_conv1")(x)
    out = keras.layers.Conv2D(channels, 3, padding="same", activation="tanh",
                              name="final_conv2")(x)
    return keras.Model(inp, out)


def build_keras_esrgan_discriminator(input_hw=96):
    """Reference discriminator (ESRGAN_model.py:347-377): 6 SN convs
    (64,64,64,128,128,256 / strides 1,2,1,2,1,2), GAP, SN-Dense 256,
    SN-Dense 1 sigmoid."""
    from tensorflow import keras

    SN = keras.layers.SpectralNormalization
    inp = keras.Input(shape=(input_hw, input_hw, 3), name="hr_input")
    x = SN(keras.layers.Conv2D(64, 3, padding="same", name="disc_conv1"))(inp)
    x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
    for i, (f, s) in enumerate(zip((64, 64, 128, 128, 256), (2, 1, 2, 1, 2))):
        x = SN(keras.layers.Conv2D(f, 3, strides=s, padding="same",
                                   name=f"disc_conv{i + 2}"))(x)
        x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
    x = keras.layers.GlobalAveragePooling2D(name="disc_gap")(x)
    x = SN(keras.layers.Dense(256, name="disc_dense1"))(x)
    x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
    out = SN(keras.layers.Dense(1, activation="sigmoid", name="disc_output"))(x)
    return keras.Model(inp, out)


def build_keras_vgg16_classifier(num_classes=2, input_shape=(96, 96, 3),
                                 dense_units=256, dropout=0.3):
    """Reference FineTunedVGG16 (VGG16_model.py:84-97): VGG16 base
    (include_top=False) -> GAP -> Dropout -> Dense relu -> Dropout ->
    Dense softmax."""
    from tensorflow import keras

    base = keras.applications.VGG16(include_top=False, weights=None,
                                    input_shape=input_shape)
    inp = keras.Input(shape=input_shape)
    x = base(inp, training=False)
    x = keras.layers.GlobalAveragePooling2D()(x)
    x = keras.layers.Dropout(dropout)(x)
    x = keras.layers.Dense(dense_units, activation="relu", name="fc1")(x)
    x = keras.layers.Dropout(dropout)(x)
    out = keras.layers.Dense(num_classes, activation="softmax",
                             name="predictions")(x)
    return keras.Model(inp, out)


# ----------------------------------------------------------------- export
def export_srcnn(params: dict, path: str) -> None:
    """flax SRCNN params (conv1/conv2/conv3) -> reference-format .h5."""
    k1, k2, k3 = (np.asarray(_np(params[f"conv{i}"]["kernel"]))
                  for i in (1, 2, 3))
    km = build_keras_srcnn(f1=k1.shape[3], f2=k2.shape[3], k1=k1.shape[0],
                           k2=k2.shape[0], k3=k3.shape[0],
                           channels=k1.shape[2])
    for i in (1, 2, 3):
        km.get_layer(f"conv{i}").set_weights(
            [_np(params[f"conv{i}"]["kernel"]), _np(params[f"conv{i}"]["bias"])])
    km.save(path)


def export_edsr(params: dict, path: str, res_scaling: float = 0.1) -> None:
    """flax EDSR params -> reference-format .h5 (scale inferred from the
    upsample kernels). ``res_scaling`` is graph structure, not a weight —
    it must match the trained model's value (EDSR_model.py:47) or the
    exported graph scales every residual branch wrongly."""
    n_res = len([k for k in params if k.startswith("res")])
    nf = int(params["head"]["kernel"].shape[3])
    r2 = int(params["up0"]["kernel"].shape[3]) // nf
    scale = 4 if "up1" in params else int(round(r2 ** 0.5))
    km = build_keras_edsr(scale=scale, num_res_blocks=n_res, num_filters=nf,
                          channels=int(params["head"]["kernel"].shape[2]),
                          res_scaling=res_scaling)
    names = (["head"]
             + [f"res{i}_conv{j}" for i in range(n_res) for j in (1, 2)]
             + ["body"] + [f"up{i}" for i in range(2 if scale == 4 else 1)]
             + ["tail"])
    for name in names:
        node = params
        if name.startswith("res"):
            stem, conv = name.split("_")
            node = params[stem][conv]
        else:
            node = params[name]
        km.get_layer(name).set_weights([_np(node["kernel"]), _np(node["bias"])])
    km.save(path)


def export_esrgan_generator(params: dict, path: str) -> None:
    """flax ESRGANGenerator params -> reference-format .h5."""
    filters = int(params["initial_conv"]["kernel"].shape[3])
    channels = int(params["initial_conv"]["kernel"].shape[2])
    n_rrdb = len([k for k in params if k.startswith("rrdb_")])
    growth = int(params["rrdb_0"]["dense1"]["conv1"]["kernel"].shape[3])
    n_up = len([k for k in params if k.startswith("upsample_")])
    km = build_keras_esrgan_generator(scale=2 ** n_up, growth=growth,
                                      n_rrdb=n_rrdb, filters=filters,
                                      channels=channels)

    def setw(layer_name, node):
        km.get_layer(layer_name).set_weights(
            [_np(node["kernel"]), _np(node["bias"])])

    setw("initial_conv", params["initial_conv"])
    for i in range(n_rrdb):
        for j in (1, 2, 3):
            for k in (1, 2, 3, 4, 5):
                setw(f"rrdb_{i}_dense{j}_conv{k}",
                     params[f"rrdb_{i}"][f"dense{j}"][f"conv{k}"])
    setw("trunk_conv", params["trunk_conv"])
    for att_name in ("self_attention_trunk", "self_attention_upsample_0"):
        att = km.get_layer(att_name)
        for tag in ("f", "g", "h", "v"):
            getattr(att, tag).set_weights(
                [_np(params[att_name][tag]["kernel"]),
                 _np(params[att_name][tag]["bias"])])
    for i in range(n_up):
        setw(f"upsample_{i}_conv", params[f"upsample_{i}_conv"])
    setw("final_conv1", params["final_conv1"])
    setw("final_conv2", params["final_conv2"])
    km.save(path)


def export_esrgan_discriminator(params: dict, spectral: dict, path: str,
                                input_hw: int = 96) -> None:
    """flax ESRGANDiscriminator params + spectral-u state -> .h5 with Keras
    SpectralNormalization wrappers (the reference's resume artifact,
    ESRGAN_model.py:989-993)."""
    from tensorflow import keras

    km = build_keras_esrgan_discriminator(input_hw=input_hw)
    inner_to_flax = {f"disc_conv{i}": f"conv{i}" for i in range(1, 7)}
    inner_to_flax.update({"disc_dense1": "dense1", "disc_output": "output"})
    for layer in km.layers:
        if not isinstance(layer, keras.layers.SpectralNormalization):
            continue
        flax_name = inner_to_flax[layer.layer.name]
        layer.layer.set_weights([_np(params[flax_name]["kernel"]),
                                 _np(params[flax_name]["bias"])])
        u = _np(spectral[flax_name]["u"])
        layer.vector_u.assign(u.reshape(layer.vector_u.shape))
    km.save(path)


def export_vgg16_classifier(params: dict, path: str,
                            input_shape=(96, 96, 3), dropout=0.3) -> None:
    """flax VGG16Classifier params -> reference-format .h5 (nested VGG16
    base + fc1/predictions head)."""
    num_classes = int(params["predictions"]["bias"].shape[0])
    dense_units = int(params["fc1"]["bias"].shape[0])
    km = build_keras_vgg16_classifier(num_classes=num_classes,
                                      input_shape=input_shape,
                                      dense_units=dense_units,
                                      dropout=dropout)
    base = km.get_layer("vgg16")
    for name, node in params["vgg16"].items():
        base.get_layer(name).set_weights([_np(node["kernel"]),
                                          _np(node["bias"])])
    for name in ("fc1", "predictions"):
        km.get_layer(name).set_weights([_np(params[name]["kernel"]),
                                        _np(params[name]["bias"])])
    km.save(path)
