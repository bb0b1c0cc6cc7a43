"""Sequence-parallel analog (SURVEY §5): ring attention over a sharded token
axis and spatially-sharded full-image ESRGAN SR — exact equality with the
dense single-device paths on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.dist import make_mesh, make_ring_attention, full_image_esrgan_sr
from tpusr.models import ESRGANGenerator
from tpusr.models.layers import SelfAttention


def test_ring_attention_matches_dense():
    mesh = make_mesh(8)
    dense = SelfAttention(channels=16)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 16),
                                                    dtype=np.float32))
    v = dense.init(jax.random.PRNGKey(0), x)
    want = np.asarray(dense.apply(v, x))

    ring = SelfAttention(channels=16,
                         attention_fn=make_ring_attention(mesh))
    got = np.asarray(ring.apply(v, x))  # same params; 64 tokens over 8 devs
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ring_attention_rejects_indivisible_tokens():
    mesh = make_mesh(8)
    attn = make_ring_attention(mesh)
    bad = jnp.zeros((1, 12, 4))  # 12 tokens not divisible by 8
    with pytest.raises(ValueError, match="not divisible"):
        attn(bad, bad, bad)


@pytest.mark.slow  # 20s; the driver's dryrun_multichip asserts sp_full_image_sr_maxerr every round, and ring_attention==dense stays quick above
def test_full_image_sr_matches_unsharded():
    mesh = make_mesh(8)
    gen = ESRGANGenerator(scale_factor=2, growth_channels=4,
                          num_rrdb_blocks=1, base_filters=8)
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3),
                                                    dtype=np.float32) * 2 - 1)
    v = gen.init(jax.random.PRNGKey(0), x)
    want = np.asarray(gen.apply(v, x))  # dense, single logical device

    got = full_image_esrgan_sr(gen, v, x, mesh)
    assert got.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_super_resolve_full_image_blockwise_and_mesh_paths():
    from tpusr.pipeline import super_resolve_full_image
    from tpusr.pipeline.inference import _largest_divisor_at_most

    assert _largest_divisor_at_most(64, 48) == 32
    assert _largest_divisor_at_most(17, 4) == 1  # prime falls back to dense-ish

    gen = ESRGANGenerator(scale_factor=2, growth_channels=4,
                          num_rrdb_blocks=1, base_filters=8)
    lr = np.random.default_rng(3).random((16, 16, 3), dtype=np.float32)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    want = np.clip(
        (np.asarray(gen.apply(v, jnp.asarray(lr)[None] * 2 - 1))[0] + 1) / 2,
        0, 1)

    # single-device blockwise path (block 64 divides 256 tokens)
    sr_b, metrics = super_resolve_full_image(gen, v, lr,
                                             attention_block_size=64)
    assert sr_b.shape == (32, 32, 3) and "time_sec" in metrics
    np.testing.assert_allclose(sr_b, want, atol=3e-5, rtol=3e-5)

    # mesh path (H=16 divisible by 8): ring attention + H sharding
    sr_m, _ = super_resolve_full_image(gen, v, lr, mesh=make_mesh(8))
    np.testing.assert_allclose(sr_m, want, atol=5e-5, rtol=5e-5)


@pytest.mark.slow  # second full generator compile (~14s); the mesh path
def test_full_image_sr_fn_is_cached():  # itself is covered in the quick loop
    """Repeated full_image_esrgan_sr calls with the same generator config and
    mesh reuse one jitted wrapper (jit's shape cache then avoids per-image
    recompiles)."""
    from tpusr.dist.spatial import _full_image_sr_fn

    _full_image_sr_fn.cache_clear()
    mesh = make_mesh(4)
    gen = ESRGANGenerator(scale_factor=2, growth_channels=2,
                          num_rrdb_blocks=1)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    img = jnp.asarray(np.random.default_rng(0)
                      .random((1, 8, 8, 3), np.float32) * 2 - 1)
    a = np.asarray(full_image_esrgan_sr(gen, variables, img, mesh))
    b = np.asarray(full_image_esrgan_sr(gen, variables, img, mesh))
    info = _full_image_sr_fn.cache_info()
    assert info.hits >= 1 and info.misses == 1, info
    np.testing.assert_array_equal(a, b)
