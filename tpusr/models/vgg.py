"""VGG16 defect classifier and VGG19 perceptual-feature extractor.

Parity targets:
- ``FineTunedVGG16`` (``defect_detection_models/VGG16_model.py:57-97``):
  VGG16 conv base (include_top=False, ImageNet weights, frozen by default with
  the last N non-BN layers optionally trainable) -> GAP -> Dropout ->
  Dense 256 relu (optional L2) -> Dropout -> Dense softmax.
  96x96 input / 2 classes = 14,846,530 params.
- VGG19 feature extractor to ``block5_conv4`` (``ESRGAN_model.py:379-399``),
  frozen, 20,024,384 params, fed keras 'caffe' preprocessing
  (RGB->BGR, mean subtract; ESRGAN_model.py:401-408).

ImageNet weights are not downloadable in this environment; use
``load_keras_h5_weights`` to import a Keras ``.h5`` checkpoint when available
(tests of logit parity require it), otherwise the models run with their
initializers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

# (block, convs-in-block, filters)
_VGG16_CFG = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))
_VGG19_CFG = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

IMAGENET_BGR_MEAN = (103.939, 116.779, 123.68)


def preprocess_caffe(x_rgb_255: jnp.ndarray) -> jnp.ndarray:
    """keras.applications preprocess_input(mode='caffe'): RGB->BGR, mean-subtract."""
    x = x_rgb_255[..., ::-1]
    return x - jnp.asarray(IMAGENET_BGR_MEAN, x.dtype)


class _VGGBackbone(nn.Module):
    cfg: tuple
    until: str | None = None  # e.g. 'block5_conv4' stops after that layer

    @nn.compact
    def __call__(self, x):
        for block, n_convs, filters in self.cfg:
            for ci in range(1, n_convs + 1):
                name = f"block{block}_conv{ci}"
                x = nn.relu(nn.Conv(filters, (3, 3), padding="SAME", name=name)(x))
                if self.until == name:
                    return x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.until is not None:  # typo'd stop layer must not silently
            raise ValueError(       # return the wrong (post-pool5) features
                f"until={self.until!r} matched no layer of this backbone")
        return x


class VGG19Features(nn.Module):
    """VGG19 up to block5_conv4 (perceptual-loss extractor)."""

    @nn.compact
    def __call__(self, x):
        return _VGGBackbone(_VGG19_CFG, until="block5_conv4", name="vgg19")(x)


class VGG16Classifier(nn.Module):
    """Fine-tuned VGG16 defect classifier (VGG16_model.py:57-97)."""

    num_classes: int = 2
    dropout_rate: float = 0.2
    dense_units: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _VGGBackbone(_VGG16_CFG, name="vgg16")(x)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.dense_units, name="fc1")(x))
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="predictions")(x)
        return nn.softmax(x)


def load_keras_h5_weights(params: dict, h5_path: str, backbone_key: str) -> dict:
    """Import conv kernels/biases from a Keras VGG .h5 into a flax params tree.

    Keras Conv2D kernels are (kh, kw, in, out) — same layout as flax — so the
    copy is direct, keyed by layer name (block{i}_conv{j}).
    """
    from tpusr.train.keras_import import keras_layer_weights, _leaf, _layer_of

    out = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    bb = {k: dict(v) for k, v in out[backbone_key].items()}
    filled = set()
    for _lname, ws in keras_layer_weights(h5_path):
        for wname, arr in ws:
            layer = _layer_of(wname)
            if layer in bb and _leaf(wname) == "kernel":
                bias = next((a for w2, a in ws
                             if _layer_of(w2) == layer and _leaf(w2) == "bias"),
                            None)
                if bias is None:
                    raise ValueError(f"{h5_path}: layer {layer!r} has a "
                                     f"kernel but no bias")
                want = tuple(np.shape(bb[layer]["kernel"]))
                if tuple(arr.shape) != want:
                    raise ValueError(
                        f"{h5_path}: shape mismatch at {layer}: h5 "
                        f"{arr.shape} vs flax {want}")
                bb[layer] = {"kernel": jnp.asarray(arr), "bias": jnp.asarray(bias)}
                filled.add(layer)
    missing = sorted(set(bb) - filled)
    if missing:
        # an .h5 with unparsable names (or the wrong VGG variant) must not
        # silently leave layers at random init — the perceptual loss /
        # classifier would train against garbage with no error
        raise ValueError(
            f"{h5_path}: no weights found for backbone layers {missing}")
    out[backbone_key] = bb
    return out
