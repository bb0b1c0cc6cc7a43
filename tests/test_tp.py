"""Tensor parallelism (channel-sharded params on a ('data','model') mesh):
forward and train-step outputs match the replicated single-device run.
XLA's SPMD partitioner inserts all collectives from the shardings alone."""

import numpy as np

import jax
import jax.numpy as jnp

from tpusr.dist import make_tp_mesh, shard_params_tp, shard_batch
from tpusr.models import EDSR, VGG16Classifier
from tpusr.train import SupervisedSRTrainer


def test_vgg16_forward_dp_tp_matches_replicated():
    mesh = make_tp_mesh(4, 2)
    model = VGG16Classifier(num_classes=2)
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3),
                                                    dtype=np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(v, x))

    v_tp = shard_params_tp(mesh, v)
    x_dp = shard_batch(mesh, x)
    got = np.asarray(jax.jit(model.apply)(v_tp, x_dp))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_edsr_forward_tp_matches_replicated():
    mesh = make_tp_mesh(2, 4)
    model = EDSR(scale_factor=2, num_res_blocks=2)
    x = jnp.asarray(np.random.default_rng(1).random((2, 12, 12, 3),
                                                    dtype=np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(v, x))

    got = np.asarray(jax.jit(model.apply)(shard_params_tp(mesh, v),
                                          shard_batch(mesh, x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_train_step_dp_tp_matches_replicated():
    # The SAME jit'd train step runs replicated or DP x TP depending only on
    # input shardings; one step's loss and updated params must agree.
    from tpusr.models import SRCNN

    mesh = make_tp_mesh(4, 2)
    trainer = SupervisedSRTrainer(SRCNN())
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((8, 12, 12, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((8, 12, 12, 3), dtype=np.float32))

    st0 = trainer.init_state(x[:1])
    # The jit'd step donates its input state, and device_put aliases the
    # buffer of the shard a leaf already lives on — so the TP state must be
    # built from fresh copies, not views of st0. The whole state tree is
    # sharded: Adam moments get the same channel sharding as their
    # parameters, scalars replicate.
    st_tp = shard_params_tp(mesh, jax.tree.map(jnp.copy, st0))
    st_ref, m_ref = trainer.train_step(st0, x, y)
    st_sh, m_sh = trainer.train_step(st_tp, *shard_batch(mesh, x, y))

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               atol=1e-5, rtol=1e-5)
    ref_leaves = jax.tree.leaves(st_ref.params)
    sh_leaves = jax.tree.leaves(st_sh.params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5)
