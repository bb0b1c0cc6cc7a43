"""Round-2 trainer-semantics fixes (VERDICT items 5/6/8/9 + ADVICE high):

- fit() continues from loaded/facade state instead of re-initializing
- l2_reg applies the Keras Dense-256 kernel penalty
- unsupported loss strings raise
- trailing partial batches are padded-and-masked (mesh == single device)
- MetricsLogger is wired through fit()
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.dist import make_mesh
from tpusr.models import SRCNN, VGG16Classifier
from tpusr.train import SupervisedSRTrainer, ClassifierTrainer


@pytest.fixture(scope="module")
def clf_data():
    rng = np.random.default_rng(0)
    # 32x32 minimum: VGG16's five 2x2 pools need >= 2^5 spatial extent
    x = rng.random((20, 32, 32, 3), dtype=np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0.5).astype(np.int32)
    return x, y


def test_fit_continues_from_given_state(clf_data):
    """ADVICE r1 high: facade-loaded weights must survive fit()."""
    x, y = clf_data
    trainer = ClassifierTrainer(
        VGG16Classifier(num_classes=2),
        trainable_predicate=lambda path: path[0] != "vgg16")  # frozen backbone
    state = trainer.init_state(x[:1])
    sentinel = jax.tree.map(lambda a: jnp.full_like(a, 0.123),
                            state.params["vgg16"])
    state = state.replace(params={**state.params, "vgg16": sentinel})
    res = trainer.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8, epochs=1,
                      verbose=False, state=state)
    for leaf in jax.tree.leaves(jax.device_get(res.state.params["vgg16"])):
        np.testing.assert_array_equal(np.asarray(leaf), np.float32(0.123))


def test_facade_fit_uses_loaded_state(clf_data):
    from tpusr.models.api import FineTunedVGG16

    x, y = clf_data
    m = FineTunedVGG16()
    m.setup_model(input_shape=(32, 32, 3), base_trainable=False)
    sentinel = jax.tree.map(lambda a: jnp.full_like(a, 0.321),
                            m.state.params["vgg16"])
    m.state = m.state.replace(params={**m.state.params, "vgg16": sentinel})
    m.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8, epochs=1,
          use_augmentation=False)
    for leaf in jax.tree.leaves(jax.device_get(m.state.params["vgg16"])):
        np.testing.assert_array_equal(np.asarray(leaf), np.float32(0.321))


@pytest.mark.slow  # 25s TF-oracle VGG16 build; l2 wiring itself is exercised by the quick trainer tests
def test_l2_reg_matches_keras_penalty(clf_data):
    """Loss(l2_reg) - Loss(0) on identical params/batch/dropout-key must equal
    the Keras l2 regularizer value on the Dense-256 kernel."""
    x, y = clf_data
    l2 = 1e-3
    plain = ClassifierTrainer(VGG16Classifier(num_classes=2))
    reg = ClassifierTrainer(VGG16Classifier(num_classes=2), l2_reg=l2)
    s0 = plain.init_state(x[:1])
    s1 = reg.init_state(x[:1])
    xb, yb = jnp.asarray(x[:8]), jnp.asarray(y[:8])
    step = jnp.asarray(0, jnp.uint32)
    kernel = np.asarray(jax.device_get(s0.params["fc1"]["kernel"]))

    import tensorflow as tf
    want = float(tf.keras.regularizers.l2(l2)(tf.constant(kernel)))

    # evaluate() includes the penalty too (Keras evaluate reports total loss);
    # evaluate before train_step — the train step donates its state buffers
    e0 = plain.evaluate(s0, x[:8], y[:8], batch_size=8)
    e1 = reg.evaluate(s1, x[:8], y[:8], batch_size=8)
    assert abs((e1["loss"] - e0["loss"]) - want) < 1e-5

    _, m0 = plain.train_step(s0, xb, yb, step)
    _, m1 = reg.train_step(s1, xb, yb, step)
    got_penalty = float(m1["loss"]) - float(m0["loss"])
    assert abs(got_penalty - want) < 1e-5


def test_unsupported_loss_raises():
    from tpusr.models.api import FineTunedVGG16

    m = FineTunedVGG16()
    with pytest.raises(ValueError, match="Unsupported loss"):
        m.setup_model(input_shape=(32, 32, 3), loss="categorical_hinge")


def test_trailing_batch_mesh_matches_single_device():
    """VERDICT r1 item 8: dataset size not a multiple of batch x devices —
    identical histories single-device vs mesh (pad-and-mask, not drop)."""
    rng = np.random.default_rng(1)
    y = rng.random((22, 12, 12, 3), dtype=np.float32)  # 22 = 2*8 + 6 trailing
    x = np.roll(y, 1, axis=1)

    def run(mesh):
        t = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3, mesh=mesh)
        res = t.fit(x[:22], y[:22], x[:10], y[:10], batch_size=8, epochs=2,
                    verbose=False)
        return res.history

    h1 = run(None)
    h8 = run(make_mesh(8))
    for k in ("loss", "val_loss", "psnr", "val_psnr"):
        np.testing.assert_allclose(h1[k], h8[k], atol=1e-5, err_msg=k)


def test_best_weight_restore_keeps_mesh_sharding():
    """EarlyStopping's snapshot is a device-side jnp.copy: after the
    best-weight restore, a mesh-trained state's params must still carry
    their replicated NamedSharding (a host round-trip used to return them
    unsharded) so follow-up sharded steps don't re-place them."""
    rng = np.random.default_rng(3)
    y = rng.random((16, 12, 12, 3), dtype=np.float32)
    x = np.roll(y, 1, axis=1)
    mesh = make_mesh(8)
    t = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3, mesh=mesh)
    res = t.fit(x, y, x[:8], y[:8], batch_size=8, epochs=2, verbose=False)
    leaf = jax.tree.leaves(res.state.params)[0]
    assert getattr(leaf.sharding, "mesh", None) is not None, leaf.sharding
    assert set(leaf.sharding.mesh.axis_names) == set(mesh.axis_names)
    # and the restored params still run a sharded eval step
    ev = t.evaluate(res.state, x[:8], y[:8], batch_size=8)
    assert np.isfinite(ev["loss"])


def test_trailing_batch_trains_on_it():
    """The trailing rows must actually contribute: a 1-sample trailer with a
    huge-error target changes the first-epoch loss."""
    rng = np.random.default_rng(2)
    y = rng.random((9, 8, 8, 3), dtype=np.float32)
    x = y.copy()
    y2 = y.copy()
    y2[8] += 100.0  # only in the trailing batch

    def first_loss(targets):
        t = SupervisedSRTrainer(SRCNN(f1=4, f2=2), learning_rate=1e-9)
        res = t.fit(x, targets, x[:4], targets[:4], batch_size=8, epochs=1,
                    verbose=False)
        return res.history["loss"][0]

    assert first_loss(y2) > first_loss(y) + 1.0


def test_metrics_logger_wired(tmp_path, clf_data):
    from tpusr.train.logging import MetricsLogger, read_jsonl, jsonl_to_csv

    # logger wiring is network-independent; a tiny classifier keeps this in
    # the quick loop (full-VGG16 fit paths are covered by the other tests here)
    import flax.linen as nn

    class TinyClf(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(nn.Conv(8, (3, 3))(x)).mean(axis=(1, 2))
            return nn.softmax(nn.Dense(2)(x))

    x, y = clf_data
    path = os.path.join(tmp_path, "metrics.jsonl")
    trainer = ClassifierTrainer(TinyClf())
    with MetricsLogger(path, run_name="t") as logger:
        trainer.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8, epochs=2,
                    verbose=False, metrics_logger=logger)
    recs = read_jsonl(path, scope="epoch")
    assert len(recs) == 2
    assert {"loss", "accuracy", "val_loss", "val_accuracy", "lr",
            "epoch_time_sec"} <= set(recs[0])
    csv_path = os.path.join(tmp_path, "metrics.csv")
    jsonl_to_csv(path, csv_path, scope="epoch")
    assert os.path.exists(csv_path)


@pytest.mark.slow  # training-convergence (60s); augmentation goldens in test_augment
def test_augmented_fit_still_learns(clf_data):
    x, y = clf_data
    trainer = ClassifierTrainer(VGG16Classifier(num_classes=2),
                                learning_rate=1e-3)
    res = trainer.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8, epochs=2,
                      verbose=False, augment=True)
    assert np.isfinite(res.history["loss"]).all()
    # augmentation must be active: training loss differs from the
    # non-augmented run with identical seeds
    res2 = trainer.fit(x[:16], y[:16], x[16:], y[16:], batch_size=8, epochs=2,
                       verbose=False, augment=False)
    assert abs(res.history["loss"][0] - res2.history["loss"][0]) > 1e-6
