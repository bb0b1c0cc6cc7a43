"""bf16 mixed-precision training: compute_dtype='bfloat16' runs the network
forward on the MXU's fast path while master params, optimizer state, losses,
and metrics stay float32 (no loss scaling needed: bf16 shares f32's exponent
range). The reference trains pure float32 — float32 stays the default, and
the existing trainer tests pin that path bit-for-bit."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import SRCNN, ESRGANGenerator, ESRGANDiscriminator
from tpusr.train import SupervisedSRTrainer, ClassifierTrainer, ESRGANTrainer


def _all_f32(tree):
    return all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(tree)
               if jnp.issubdtype(leaf.dtype, jnp.floating))


class _TinyClf(nn.Module):
    """Minimal classifier with the fc1 head ClassifierTrainer's l2_reg expects."""

    @nn.compact
    def __call__(self, x, train=False, **kw):
        h = nn.relu(nn.Conv(8, (3, 3))(x)).mean(axis=(1, 2))
        h = nn.relu(nn.Dense(16, name="fc1")(h))
        return nn.softmax(nn.Dense(2)(h))


class _TinyFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(8, (3, 3))(nn.relu(nn.Conv(8, (3, 3))(x)))


def test_bf16_sr_trainer_tracks_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 16, 16, 3), np.float32))
    y = jnp.asarray(rng.random((8, 16, 16, 3), np.float32))

    losses = {}
    for dt in ("float32", "bfloat16"):
        tr = SupervisedSRTrainer(SRCNN(), compute_dtype=dt)
        st = tr.init_state(x[:1])
        run = []
        for _ in range(5):
            st, m = tr.train_step(st, x, y)
            run.append(float(m["loss"]))
        losses[dt] = run
        # master params and Adam moments never leave f32
        assert _all_f32(st.params) and _all_f32(st.opt_state)
        ev = tr.eval_step(st, x, y)
        assert np.isfinite(float(ev["loss"]))
    # bf16 forward rounding perturbs the trajectory only slightly
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.02)


def test_bf16_classifier_step_with_l2_and_augment():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    y = jnp.asarray(rng.integers(0, 2, 8))
    tr = ClassifierTrainer(_TinyClf(), compute_dtype="bfloat16", l2_reg=0.01)
    st = tr.init_state(x[:1])
    st, m = tr._train_step_w(st, x, y, jnp.ones((8,), jnp.float32),
                             jnp.asarray(0, jnp.uint32), True)
    assert np.isfinite(float(m["loss"])) and 0.0 <= float(m["accuracy"]) <= 1.0
    assert _all_f32(st.params)
    ev = tr.eval_step(st, x, y)
    assert np.isfinite(float(ev["loss"]))


def test_facade_compute_dtype_wiring():
    """setup_model(compute_dtype=...) reaches the trainer on every facade."""
    from tpusr.models.api import SRCNNModel, EDSR as EDSRFacade

    m = SRCNNModel()
    m.setup_model(compute_dtype="bfloat16")
    assert m.trainer.compute_dtype == jnp.bfloat16

    e = EDSRFacade()
    e.setup_model(scale_factor=2, num_res_blocks=1, num_filters=8,
                  compute_dtype="bfloat16")
    assert e.trainer.compute_dtype == jnp.bfloat16


@pytest.mark.slow  # 57s (two GAN-step compiles); bf16 cast machinery stays quick via the SR/classifier tests, and PERF.md records a 300-step on-chip bf16 GAN soak
def test_bf16_gan_step_close_to_f32():
    rng = np.random.default_rng(2)
    lr_ = jnp.asarray(rng.random((4, 8, 8, 3), np.float32)) * 2 - 1
    hr_ = jnp.asarray(rng.random((4, 16, 16, 3), np.float32)) * 2 - 1
    gen = ESRGANGenerator(scale_factor=2, growth_channels=4, num_rrdb_blocks=1)
    disc = ESRGANDiscriminator()
    vgg = _TinyFeatures()
    vp = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]

    out = {}
    for dt in ("float32", "bfloat16"):
        tr = ESRGANTrainer(gen, disc, vgg, vp, compute_dtype=dt)
        st = tr.init_state((8, 8, 3), (16, 16, 3))
        st, m = tr.train_step(st, lr_, hr_)
        out[dt] = (float(m["g_loss"]), float(m["d_loss"]))
        assert _all_f32(st.g_params) and _all_f32(st.d_params)
        # the spectral-norm power iteration is kept f32 by design
        assert _all_f32(st.d_spectral)
    np.testing.assert_allclose(out["bfloat16"], out["float32"], rtol=0.02)
