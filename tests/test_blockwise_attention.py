"""Blockwise (online-softmax) self-attention: exact equality with the dense
HW^2 path on identical parameters — the SURVEY §5 long-context analog that
bounds ESRGAN attention memory for full-image SR."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.models import ESRGANGenerator
from tpusr.models.layers import SelfAttention


def test_blockwise_attention_matches_dense():
    dense = SelfAttention(channels=16)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 16),
                                                    dtype=np.float32))
    v = dense.init(jax.random.PRNGKey(0), x)
    want = np.asarray(dense.apply(v, x))
    for block in (8, 16, 32):  # divisors of HW=64
        blockwise = SelfAttention(channels=16, block_size=block)
        got = np.asarray(blockwise.apply(v, x))  # same params, same math
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_blockwise_attention_dense_fallback_and_divisibility():
    x = jnp.asarray(np.random.default_rng(1).random((1, 4, 4, 16),
                                                    dtype=np.float32))
    big_block = SelfAttention(channels=16, block_size=64)  # HW=16 <= block
    v = big_block.init(jax.random.PRNGKey(0), x)
    dense = SelfAttention(channels=16)
    np.testing.assert_allclose(np.asarray(big_block.apply(v, x)),
                               np.asarray(dense.apply(v, x)), atol=1e-6)

    bad = SelfAttention(channels=16, block_size=5)  # 5 does not divide 16
    with pytest.raises(ValueError, match="divide"):
        bad.init(jax.random.PRNGKey(0), x)


@pytest.mark.slow  # 19s double-generator compile; the layer-level equality test above stays quick
def test_generator_blockwise_matches_dense():
    gen_d = ESRGANGenerator(scale_factor=2, growth_channels=4,
                            num_rrdb_blocks=1, base_filters=8)
    gen_b = ESRGANGenerator(scale_factor=2, growth_channels=4,
                            num_rrdb_blocks=1, base_filters=8,
                            attention_block_size=32)
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 3),
                                                    dtype=np.float32) * 2 - 1)
    v = gen_d.init(jax.random.PRNGKey(0), x)
    want = np.asarray(gen_d.apply(v, x))
    got = np.asarray(gen_b.apply(v, x))  # same param tree (block is config)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
