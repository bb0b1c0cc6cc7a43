"""flax -> .h5 -> flax round-trip bit-equality for all five networks, plus
Keras ``load_model`` smokes — the reference toolchain can consume
tpusr-trained checkpoints (VERDICT r2 missing #2; reference save methods:
SRCNN_model.py:249-259, EDSR_model.py:317-330, ESRGAN_model.py:981-996,
VGG16_model.py:272-281)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # TF model-building suite

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tpusr.models import (EDSR, SRCNN, ESRGANDiscriminator, ESRGANGenerator,
                          VGG16Classifier)
from tpusr.train.keras_export import (edsr_custom_objects,
                                      esrgan_custom_objects, export_edsr,
                                      export_esrgan_discriminator,
                                      export_esrgan_generator, export_srcnn,
                                      export_vgg16_classifier)
from tpusr.train.keras_import import (import_edsr, import_esrgan_discriminator,
                                      import_esrgan_generator, import_srcnn,
                                      import_vgg16_classifier)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, v in la:
        np.testing.assert_array_equal(np.asarray(v, np.float32),
                                      np.asarray(lb[jax.tree_util.keystr(p)],
                                                 np.float32), err_msg=str(p))


def _randomize(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)
                              * 0.1) for l in leaves])


def test_srcnn_export_roundtrip_and_load_model(tmp_path):
    m = SRCNN()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    params = _randomize(v["params"], 1)
    path = str(tmp_path / "SRCNN_export.h5")
    export_srcnn(params, path)

    back = import_srcnn(v["params"], path)
    _trees_equal(params, back)

    km = tf.keras.models.load_model(path)
    x = np.random.default_rng(2).random((2, 24, 24, 3), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params}, jnp.asarray(x))),
        km(x).numpy(), atol=2e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_edsr_export_roundtrip_and_load_model(tmp_path, scale):
    m = EDSR(scale_factor=scale, num_res_blocks=3, num_filters=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    params = _randomize(v["params"], 3)
    path = str(tmp_path / f"EDSR_x{scale}_export.h5")
    export_edsr(params, path)

    back = import_edsr(v["params"], path, num_res_blocks=3,
                       scale_factor=scale)
    _trees_equal(params, back)

    km = tf.keras.models.load_model(path, safe_mode=False,
                                    custom_objects=edsr_custom_objects())
    x = np.random.default_rng(4).random((2, 8, 8, 3), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params}, jnp.asarray(x))),
        km(x).numpy(), atol=2e-5)


def test_edsr_export_respects_res_scaling(tmp_path):
    """res_scaling is graph structure: a non-default value must reach the
    exported Keras graph or every residual branch is scaled wrongly
    (regression: export_edsr hard-coded 0.1)."""
    m = EDSR(scale_factor=2, num_res_blocks=2, num_filters=8, res_scaling=0.3)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    params = _randomize(v["params"], 5)
    path = str(tmp_path / "EDSR_rs_export.h5")
    export_edsr(params, path, res_scaling=0.3)
    km = tf.keras.models.load_model(path, safe_mode=False,
                                    custom_objects=edsr_custom_objects())
    x = np.random.default_rng(6).random((2, 8, 8, 3), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params}, jnp.asarray(x))),
        km(x).numpy(), atol=2e-5)


def test_esrgan_generator_export_roundtrip_and_load_model(tmp_path):
    m = ESRGANGenerator(scale_factor=2, growth_channels=4, num_rrdb_blocks=2,
                        base_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    params = _randomize(v["params"], 5)
    path = str(tmp_path / "ESRGAN_generator_x2_export.h5")
    export_esrgan_generator(params, path)

    back = import_esrgan_generator(v["params"], path)
    _trees_equal(params, back)

    km = tf.keras.models.load_model(path, safe_mode=False,
                                    custom_objects=esrgan_custom_objects())
    x = (np.random.default_rng(6).random((1, 8, 8, 3), dtype=np.float32)
         * 2.0 - 1.0)
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params}, jnp.asarray(x))),
        km(x).numpy(), atol=3e-5)


def test_esrgan_discriminator_export_roundtrip(tmp_path):
    m = ESRGANDiscriminator()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = _randomize(v["params"], 7)
    spectral = jax.tree.map(
        lambda a: a / np.linalg.norm(np.asarray(a)), v["spectral"])
    path = str(tmp_path / "ESRGAN_discriminator_x2_export.h5")
    export_esrgan_discriminator(params, spectral, path, input_hw=16)

    back_p, back_s = import_esrgan_discriminator(v["params"], v["spectral"],
                                                 path)
    _trees_equal(params, back_p)
    _trees_equal(spectral, back_s)


def test_vgg16_export_roundtrip_and_load_model(tmp_path):
    m = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = _randomize(v["params"], 8)
    path = str(tmp_path / "VGG16_export.h5")
    export_vgg16_classifier(params, path, input_shape=(32, 32, 3))

    back = import_vgg16_classifier(v["params"], path)
    _trees_equal(params, back)

    km = tf.keras.models.load_model(path)
    x = np.random.default_rng(9).random((2, 32, 32, 3), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params}, jnp.asarray(x))),
        km(x, training=False).numpy(), atol=2e-5)


def test_facade_save_h5_roundtrip(tmp_path):
    """A tpusr facade can save .h5 and reload itself from it — the reference
    lifecycle (train -> save .h5 -> setup_model(from_pretrained)) closed."""
    from tpusr.models.api import SRCNNModel

    m = SRCNNModel()
    m.setup_model()
    m.state = m.state.replace(params=_randomize(m.state.params, 11))
    m._trained = True
    path = m.save_h5(str(tmp_path), "20260817")
    assert path.endswith("SRCNN_20260817.h5")

    m2 = SRCNNModel()
    m2.setup_model(from_pretrained=True, pretrained_path=path)
    x = jnp.asarray(np.random.default_rng(12).random((2, 24, 24, 3),
                                                     dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(m.module.apply({"params": m.state.params}, x)),
        np.asarray(m2.module.apply({"params": m2.state.params}, x)),
        atol=1e-6)
