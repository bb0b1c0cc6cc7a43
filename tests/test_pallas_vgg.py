"""Tests for the fused Pallas block-1 classifier kernel.

The kernel must match the XLA int8 reference (tpusr.models.quant conv /
requant semantics + reference patch protocol) BIT-EXACTLY: same integer
convolutions, same f32 requant, same trunc-cast. On the CPU test mesh the
kernel runs in Pallas interpreter mode; on a real TPU (opportunistic) it
runs compiled — tests/test_pallas_vgg.py passes in both.

Reference semantics: independently zero-padded 96x96 patches, stride 48
(/root/reference/SRModels/defect_detection_models/VGG16_model.py:206-242).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusr.models.pallas_vgg import (
    OUT_ROWS, block1_reference, build_img36_from_image, build_img36_from_poly,
    extract_patches_reference, frames_to_pooled, make_block1_fn,
    pack_b1c1_img36, pack_pair_taps_e2o)


def _fake_qtree(rng):
    q = {"layers": {}}
    for name, ci, co in (("block1_conv1", 3, 64), ("block1_conv2", 64, 64)):
        q["layers"][name] = {
            "kernel_q": jnp.asarray(
                rng.integers(-127, 128, (3, 3, ci, co)).astype(np.int8)),
            "rescale": jnp.asarray(rng.random(co).astype(np.float32) * 1e-3),
            "bias_over_out": jnp.asarray(
                rng.random(co).astype(np.float32) * 5 + 0.5),
        }
    return q


def test_pack_b1c1_img36_shape_and_zeros():
    rng = np.random.default_rng(0)
    k = rng.integers(-127, 128, (3, 3, 3, 64)).astype(np.int8)
    w = pack_b1c1_img36(k)
    assert w.shape == (128, 128)
    assert (w[36:] == 0).all()
    # even output pixel lane 0 gets window cols 0..2 only
    assert (w[9:12, :64] == 0).all()       # f=3 unused by even pixel
    assert (w[0:3, 64:] == 0).all()        # f=0 unused by odd pixel


def test_pack_pair_taps_zero_blocks():
    rng = np.random.default_rng(1)
    k = rng.integers(-127, 128, (3, 3, 64, 64)).astype(np.int8)
    t = pack_pair_taps_e2o(k)
    assert t.shape == (3, 2, 128, 128)
    for dy in range(3):
        assert (t[dy, 0, 0:64, 64:128] == 0).all()
        assert (t[dy, 1, 64:128, 0:64] == 0).all()


def test_extract_patches_reference_matches_loader_grid():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(-127, 128, (1, 128, 128, 3))
                      .astype(np.int8))
    p = extract_patches_reference(img, 2, 2)
    assert p.shape == (4, 96, 96, 3)
    # top-left patch is the unpadded corner
    np.testing.assert_array_equal(np.asarray(p[0]),
                                  np.asarray(img[0, :96, :96, :]))


@pytest.mark.slow  # interpret-mode kernel run (~1 min on CPU)
def test_block1_kernel_bit_exact_vs_reference():
    rng = np.random.default_rng(3)
    q = _fake_qtree(rng)
    n_pr = n_pc = 2
    img = jnp.asarray(rng.integers(-127, 128, (2, 128, 128, 3))
                      .astype(np.int8))
    img36 = build_img36_from_image(img, n_pr, n_pc)
    got = np.asarray(jax.jit(make_block1_fn(q, n_pr, n_pc))(img36))
    patches = extract_patches_reference(img, n_pr, n_pc)
    want = np.asarray(jax.jit(lambda p: block1_reference(q, p))(patches))
    np.testing.assert_array_equal(got[:, :1300, :], want[:, :1300, :])


def test_build_img36_from_poly_matches_image_path():
    rng = np.random.default_rng(4)
    poly = jnp.asarray(rng.integers(-127, 128, (1, 32, 32, 48))
                       .astype(np.int8))
    x = poly.reshape(1, 32, 32, 4, 4, 3)
    img = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(1, 128, 128, 3)
    a = np.asarray(build_img36_from_poly(poly, 2, 2))
    b = np.asarray(build_img36_from_image(img, 2, 2))
    np.testing.assert_array_equal(a, b)


def test_frames_to_pooled_roundtrip():
    rng = np.random.default_rng(5)
    q = _fake_qtree(rng)
    patches = jnp.asarray(rng.integers(-127, 128, (3, 96, 96, 3))
                          .astype(np.int8))
    frames = block1_reference(q, patches)
    pooled = frames_to_pooled(frames)
    assert pooled.shape == (3, 48, 48, 64)
    # recompute the pooled activations directly
    x = patches
    for name in ("block1_conv1", "block1_conv2"):
        layer = q["layers"][name]
        y = jax.lax.conv_general_dilated(
            x, layer["kernel_q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        yf = (y.astype(jnp.float32) * layer["rescale"]
              + layer["bias_over_out"])
        x = jnp.clip(yf, 0.0, 127.0).astype(jnp.int8)
    want = jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(want))
