"""Pipeline parallelism (tpusr/dist/pp.py): the pipelined EDSR forward and
train step must match the unsharded model exactly on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import EDSR
from tpusr.dist.pp import (make_pp_edsr_apply, make_pp_mesh,
                           make_pp_train_step, stack_res_params)


def _small_model_and_params(scale=2, blocks=8, filters=8):
    model = EDSR(scale_factor=scale, num_res_blocks=blocks,
                 num_filters=filters)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 3)))["params"]
    return model, params


def test_stack_res_params_layout():
    model, params = _small_model_and_params(blocks=8)
    stacked, rest = stack_res_params(params, 4)
    assert stacked["conv1"]["kernel"].shape[:2] == (4, 2)
    # stage 1, block 0 of the stage == res2
    np.testing.assert_array_equal(
        np.asarray(stacked["conv1"]["kernel"][1, 0]),
        np.asarray(params["res2"]["conv1"]["kernel"]))
    assert set(rest) == {"head", "body", "up0", "tail"}
    with pytest.raises(ValueError):
        stack_res_params(params, 3)


@pytest.mark.parametrize(
    "n_micro", [4, pytest.param(6, marks=pytest.mark.slow)])
def test_pp_forward_matches_dense(n_micro):
    model, params = _small_model_and_params(blocks=8)
    mesh = make_pp_mesh(n_stages=4)
    apply_pp = make_pp_edsr_apply(model, mesh, n_micro=n_micro)
    x = jnp.asarray(
        np.random.default_rng(0).random((12, 8, 8, 3), dtype=np.float32))
    ref = model.apply({"params": params}, x)
    got = jax.jit(apply_pp)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("scale", [3, 4])
def test_pp_forward_upsample_tail(scale):
    """Scale 3 takes the single up0-with-r=3 tail branch; scale 4 the
    chained x2 branch — both must match the dense forward."""
    model, params = _small_model_and_params(scale=scale, blocks=4)
    mesh = make_pp_mesh(n_stages=2)
    apply_pp = make_pp_edsr_apply(model, mesh, n_micro=2)
    x = jnp.asarray(
        np.random.default_rng(1).random((4, 6, 6, 3), dtype=np.float32))
    ref = model.apply({"params": params}, x)
    got = jax.jit(apply_pp)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pp_dp_composition():
    """DP x PP on a ('data', 'stage') 2-D mesh == dense forward."""
    model, params = _small_model_and_params(blocks=4)
    mesh = make_pp_mesh(n_stages=4, n_data=2)
    apply_pp = make_pp_edsr_apply(model, mesh, n_micro=4, data_axis="data")
    x = jnp.asarray(
        np.random.default_rng(2).random((8, 8, 8, 3), dtype=np.float32))
    ref = model.apply({"params": params}, x)
    got = jax.jit(apply_pp)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pp_validation_errors():
    model, params = _small_model_and_params(blocks=8)
    mesh = make_pp_mesh(n_stages=4)
    apply_pp = make_pp_edsr_apply(model, mesh, n_micro=5)
    x = jnp.zeros((12, 8, 8, 3))  # 12 % 5 != 0
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        apply_pp(params, x)


@pytest.mark.slow  # DP x PP composition: forward covered quick by
# test_pp_dp_composition, grads by test_pp_train_step_matches_dense_grads
def test_pp_dp_train_step_matches_dense():
    """DP x PP train step on the 2-D mesh == the unsharded SGD step (loss)."""
    model, params = _small_model_and_params(blocks=4)
    mesh = make_pp_mesh(n_stages=2, n_data=2)
    step_pp = jax.jit(make_pp_train_step(model, mesh, n_micro=2,
                                         learning_rate=1e-2,
                                         data_axis="data"))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    ref_loss = float(jnp.mean((model.apply({"params": params}, x) - y) ** 2))
    _, loss = step_pp(params, x, y)
    assert abs(float(loss) - ref_loss) < 1e-6


def test_pp_train_step_matches_dense_grads():
    """Loss AND updated params of the PP train step equal the unsharded step:
    jax.grad through scan+ppermute+psum is the reverse pipeline schedule."""
    model, params = _small_model_and_params(blocks=8)
    mesh = make_pp_mesh(n_stages=4)
    lr = 1e-2
    step_pp = jax.jit(make_pp_train_step(model, mesh, n_micro=4,
                                         learning_rate=lr))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))

    def dense_loss(p):
        pred = model.apply({"params": p}, x)
        return jnp.mean((pred - y) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(dense_loss)(params)
    ref_params = jax.tree.map(lambda p, g: p - lr * g, params, ref_grads)

    new_params, loss = step_pp(params, x, y)
    assert abs(float(loss) - float(ref_loss)) < 1e-6
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree_util.tree_leaves_with_path(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=5e-6,
                                   err_msg=str(pa))
