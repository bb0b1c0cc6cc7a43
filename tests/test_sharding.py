"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4 item 3):
data-parallel training steps must compile, execute, and match single-device
results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.dist import make_mesh, shard_batch, batch_sharding
from tpusr.models import SRCNN, EDSR, ESRGANGenerator, ESRGANDiscriminator, VGG19Features
from tpusr.train import SupervisedSRTrainer, ESRGANTrainer


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    x = np.ones((16, 8, 8, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh, ndim=4)
    # each device holds 2 of the 16 rows
    assert xs.addressable_shards[0].data.shape[0] == 2


def test_data_parallel_step_matches_single_device(monkeypatch):
    rng = np.random.default_rng(0)
    y = rng.random((16, 12, 12, 3), dtype=np.float32)
    x = np.roll(y, 1, axis=1)

    single = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3)
    s1 = single.init_state(x[:1])
    s1, m1 = single.train_step(s1, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh()
    parallel = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3, mesh=mesh)
    s8 = parallel.init_state(x[:1])
    xb, yb = shard_batch(mesh, x, y)
    s8, m8 = parallel.train_step(s8, xb, yb)

    # identical init (same PRNGKey) -> identical loss and updated params
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow  # 46s real-VGG19 GAN graph; DP GAN step is certified every round by the driver's dryrun_multichip, and DP step==single equality stays quick above
def test_gan_step_data_parallel():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    y = rng.random((8, 16, 16, 3), dtype=np.float32) * 2 - 1
    x = rng.random((8, 8, 8, 3), dtype=np.float32) * 2 - 1

    gen = ESRGANGenerator(scale_factor=2, growth_channels=4, num_rrdb_blocks=1)
    disc = ESRGANDiscriminator()
    vgg = VGG19Features()
    vgg_params = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    trainer = ESRGANTrainer(gen, disc, vgg, vgg_params, mesh=mesh)
    state = trainer.init_state((8, 8, 3), (16, 16, 3))
    xb, yb = shard_batch(mesh, x, y)
    state, metrics = trainer.train_step(state, xb, yb)
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_fused_pipeline_sharded_batch():
    from tpusr.pipeline import FusedSRClassifyPipeline
    from tpusr.models import VGG16Classifier

    mesh = make_mesh()
    sr_model = EDSR(scale_factor=2, num_res_blocks=1)
    sv = sr_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    clf_model = VGG16Classifier(num_classes=2)
    cv = clf_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    pipe = FusedSRClassifyPipeline(
        sr_apply=lambda z: sr_model.apply(sv, z),
        clf_apply=lambda p: clf_model.apply(cv, p),
        lr_hw=(16, 16), scale=2, patch=32, stride=16, mesh=mesh)

    lr = np.random.default_rng(2).random((8, 16, 16, 3)).astype(np.float32)
    sr_plain, cls_plain, conf_plain = pipe(lr)
    # mesh= must make a plain-ndarray call actually run data-parallel
    # (regression: the arg was stored and ignored, silently one-device)
    assert len(sr_plain.sharding.device_set) == len(mesh.devices.ravel())
    sr_sh, cls_sh, conf_sh = pipe(shard_batch(mesh, lr))
    np.testing.assert_allclose(np.asarray(sr_plain), np.asarray(sr_sh), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cls_plain), np.asarray(cls_sh))


def test_cascade_sharded_batch_equality(monkeypatch):
    """The cascade's top_k + gather + scatter run over the BATCH axis — the
    axis data parallelism shards. XLA SPMD must produce the same votes on a
    sharded batch as on one device (it all-gathers the score vector; the
    selection itself is global). Stubbed parents keep this quick; the real-
    network cascade equality is certified by __graft_entry__.dryrun_multichip
    every round."""
    import tpusr.pipeline.cascade as casc
    from tpusr.pipeline.cascade import make_cascade_votes
    from tpusr.pipeline.defect_pipeline import _vote

    mesh = make_mesh()
    n = 8
    imgs = (jnp.arange(n * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(n, 2, 2, 3) / (n * 12.0))
    img_means = imgs.mean(axis=(1, 2, 3))
    rng = np.random.default_rng(7)
    p1 = rng.uniform(0.05, 0.95, size=n)
    trunk_probs = jnp.asarray(
        np.stack([1 - p1, p1], -1)[:, None, :].astype(np.float32))
    pp = rng.uniform(0.05, 0.95, size=n)
    pp_table = jnp.asarray(np.stack([1 - pp, pp], -1).astype(np.float32))

    def pp_apply(qtree, flat):
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]),
                         axis=1)
        return pp_table[idx]

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    for score in ("conf", "vote_frac"):
        votes = jax.jit(make_cascade_votes({}, patch=2, stride=2,
                                           escalate_frac=0.25,
                                           escalate_score=score))
        cls_1, conf_1 = votes(imgs)
        cls_8, conf_8 = votes(shard_batch(mesh, imgs))
        np.testing.assert_array_equal(np.asarray(cls_1), np.asarray(cls_8))
        np.testing.assert_allclose(np.asarray(conf_1), np.asarray(conf_8),
                                   atol=1e-6)
        # pad-mask (n_valid) under sharding: same equality
        cls_1m, _ = votes(imgs, jnp.int32(5))
        cls_8m, _ = votes(shard_batch(mesh, imgs), jnp.int32(5))
        np.testing.assert_array_equal(np.asarray(cls_1m), np.asarray(cls_8m))

    # the GUARDED cascade (the shipped default): the canary is a scalar
    # reduced over the sharded batch and the fallback branch re-classifies
    # the whole sharded batch — both lax.cond branches must agree with the
    # single-device run. The random tables make the canary land wherever it
    # lands; forcing threshold 0.0 (always trigger) and 1.01 (never) covers
    # both branches deterministically.
    for thresh in (0.0, 0.6, 1.01):
        votes = jax.jit(make_cascade_votes({}, patch=2, stride=2,
                                           escalate_frac=0.25,
                                           escalate_score="vote_frac",
                                           guard_threshold=thresh))
        cls_1, conf_1 = votes(imgs)
        cls_8, conf_8 = votes(shard_batch(mesh, imgs))
        np.testing.assert_array_equal(np.asarray(cls_1), np.asarray(cls_8))
        np.testing.assert_allclose(np.asarray(conf_1), np.asarray(conf_8),
                                   atol=1e-6)


@pytest.mark.slow  # 54s subprocess bootstrap; the driver runs dryrun_multichip directly every round
def test_dryrun_multichip_4_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)


@pytest.mark.slow  # clean-subprocess bootstrap (~2 min)
def test_dryrun_multichip_clean_subprocess():
    """The exact driver scenario: no conftest env, a host with too few
    devices — dryrun_multichip must self-bootstrap a virtual CPU mesh in a
    subprocess (the round-1 MULTICHIP failure mode)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "TPUSR_DRYRUN_CHILD")}
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout
