"""ImageNet-weights provisioning (VERDICT r1 missing #5).

- Converter/validator round-trip runs everywhere using a Keras-built VGG .h5
  as a stand-in weight file (same format as the official releases).
- Full-fidelity tests against the real ImageNet weights are gated on
  TPUSR_IMAGENET_VGG16_H5 / TPUSR_IMAGENET_VGG19_H5 (no egress here; see
  tpusr/tools/imagenet_weights.py for the offline download recipe).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.tools.imagenet_weights import (convert, expected_shapes,
                                          h5_backbone_arrays,
                                          load_backbone_weights, validate)

pytestmark = pytest.mark.slow  # TF golden-oracle suite


def _make_keras_vgg16_notop(path, input_hw=32):
    from tensorflow import keras

    base = keras.applications.VGG16(include_top=False, weights=None,
                                    input_shape=(input_hw, input_hw, 3))
    # legacy .h5 keeps block{i}_conv{j} layer names — the same named layout
    # as the official notop weight releases (keras-3 .weights.h5 does not)
    base.save(path)
    return base


def test_validate_expected_shapes():
    shapes = expected_shapes("vgg16")
    assert len(shapes) == 13
    assert shapes["block1_conv1"] == (3, 3, 3, 64)
    assert shapes["block5_conv3"] == (3, 3, 512, 512)
    assert len(expected_shapes("vgg19")) == 16


def test_convert_roundtrip_and_logit_parity(tmp_path):
    from tpusr.models import VGG16Classifier

    h5 = str(tmp_path / "vgg16_notop.h5")
    base = _make_keras_vgg16_notop(h5)

    layers = h5_backbone_arrays(h5)
    validate("vgg16", layers)

    npz = str(tmp_path / "vgg16.npz")
    convert("vgg16", h5, npz)

    model = VGG16Classifier(num_classes=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = load_backbone_weights(v["params"], npz, "vgg16")

    # backbone features must match the keras model exactly (pre-pool output)
    x = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    want = base(x).numpy()

    # run only the backbone: apply and grab the vgg16 submodule output via
    # the full model minus head — easiest is a features-only module
    from tpusr.models.vgg import _VGGBackbone, _VGG16_CFG

    bb = _VGGBackbone(_VGG16_CFG, name="vgg16")
    got = np.asarray(bb.apply({"params": params["vgg16"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_convert_rejects_wrong_arch(tmp_path):
    h5 = str(tmp_path / "vgg16_notop.h5")
    _make_keras_vgg16_notop(h5)
    with pytest.raises(ValueError, match="missing conv layers"):
        convert("vgg19", h5, str(tmp_path / "bad.npz"))


def test_facade_accepts_npz(tmp_path):
    from tpusr.models.api import FineTunedVGG16

    h5 = str(tmp_path / "vgg16_notop.h5")
    _make_keras_vgg16_notop(h5)
    npz = str(tmp_path / "vgg16.npz")
    convert("vgg16", h5, npz)

    m = FineTunedVGG16()
    m.setup_model(input_shape=(32, 32, 3), imagenet_weights_path=npz)
    data = np.load(npz)
    got = np.asarray(jax.device_get(
        m.state.params["vgg16"]["block1_conv1"]["kernel"]))
    np.testing.assert_array_equal(got, data["block1_conv1/kernel"])


@pytest.mark.skipif(not os.environ.get("TPUSR_IMAGENET_VGG16_H5"),
                    reason="real ImageNet VGG16 weights not provisioned")
def test_real_imagenet_vgg16_fidelity():
    """With the official weights present: tpusr backbone features == keras
    applications VGG16 features (the 0.9205-accuracy parity prerequisite)."""
    from tensorflow import keras
    from tpusr.models.vgg import _VGGBackbone, _VGG16_CFG
    from tpusr.models import VGG16Classifier

    path = os.environ["TPUSR_IMAGENET_VGG16_H5"]
    base = keras.applications.VGG16(include_top=False, weights=path,
                                    input_shape=(96, 96, 3))
    model = VGG16Classifier(num_classes=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    params = load_backbone_weights(v["params"], path, "vgg16")
    x = np.random.default_rng(1).random((2, 96, 96, 3)).astype(np.float32) * 255
    want = base(x).numpy()
    bb = _VGGBackbone(_VGG16_CFG, name="vgg16")
    got = np.asarray(bb.apply({"params": params["vgg16"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


@pytest.mark.skipif(not os.environ.get("TPUSR_IMAGENET_VGG19_H5"),
                    reason="real ImageNet VGG19 weights not provisioned")
def test_real_imagenet_vgg19_perceptual_fidelity():
    """VGG19 block5_conv4 features (the ESRGAN perceptual loss) match keras."""
    from tensorflow import keras
    from tpusr.models import VGG19Features

    path = os.environ["TPUSR_IMAGENET_VGG19_H5"]
    vgg = keras.applications.VGG19(include_top=False, weights=path,
                                   input_shape=(48, 48, 3))
    feat = keras.Model(vgg.input, vgg.get_layer("block5_conv4").output)
    m = VGG19Features()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    params = load_backbone_weights(v["params"], path, "vgg19")
    x = np.random.default_rng(2).random((2, 48, 48, 3)).astype(np.float32) * 255
    want = feat(x).numpy()
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def _param_count(tree):
    return sum(int(np.prod(np.asarray(l).shape))
               for l in jax.tree_util.tree_leaves(tree))


def test_documented_param_counts():
    """The reference's documented parameter counts hold for the tpusr
    architectures exactly: FineTunedVGG16 14,846,530 (VGG16.ipynb cell 6)
    and the VGG19 perceptual extractor 20,024,384 (ESRGAN.ipynb cell 6) —
    asserted now so provisioned official weights drop into matching trees."""
    from tpusr.models import VGG16Classifier, VGG19Features

    clf = VGG16Classifier(num_classes=2)
    v = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    assert _param_count(v["params"]) == 14_846_530

    vgg19 = VGG19Features()
    v19 = vgg19.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    assert _param_count(v19["params"]) == 20_024_384


def test_manifest_covers_both_releases():
    from tpusr.tools.imagenet_weights import load_manifest

    m = load_manifest()
    for key, backbone in (("vgg16_notop", 14_714_688),
                          ("vgg19_notop", 20_024_384)):
        assert m[key]["filename"].endswith("_notop.h5")
        assert len(m[key]["md5"]) == 32
        assert m[key]["backbone_params"] == backbone


def test_verify_official_rejects_wrong_file(tmp_path):
    from tpusr.tools.imagenet_weights import verify_official

    fake = tmp_path / "vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5"
    fake.write_bytes(b"not the official file")
    with pytest.raises(ValueError, match="md5"):
        verify_official(str(fake), "vgg16_notop")
    with pytest.raises(KeyError):
        verify_official(str(fake), "nope")


@pytest.mark.skipif(not os.environ.get("TPUSR_IMAGENET_VGG16_H5"),
                    reason="real ImageNet VGG16 weights not provisioned")
def test_real_imagenet_vgg16_manifest_hash():
    """Parity-on-arrival: the provisioned file IS the official release."""
    from tpusr.tools.imagenet_weights import verify_official

    verify_official(os.environ["TPUSR_IMAGENET_VGG16_H5"], "vgg16_notop")


@pytest.mark.skipif(not os.environ.get("TPUSR_IMAGENET_VGG19_H5"),
                    reason="real ImageNet VGG19 weights not provisioned")
def test_real_imagenet_vgg19_manifest_hash():
    from tpusr.tools.imagenet_weights import verify_official

    verify_official(os.environ["TPUSR_IMAGENET_VGG19_H5"], "vgg19_notop")
