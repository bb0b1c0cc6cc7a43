"""Winograd F(2x2,3x3) exactness vs lax.conv — the measured basis for the
round-3 MAC-reduction ablation (PERF.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.core.winograd import (int8_u_scales, quantize_winograd_weights,
                                 transform_weights, winograd_conv,
                                 winograd_conv_int8)


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_winograd_f32_matches_direct_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 5)).astype(np.float32) * 0.2)
    got = np.asarray(winograd_conv(x, k))
    want = np.asarray(_direct(x, k))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_transform_weights_shape_and_identity():
    rng = np.random.default_rng(1)
    k = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    t = np.asarray(transform_weights(k))
    assert t.shape == (16, 4, 6)
    # center-tap-only kernel: G g G^T puts g[1,1] times the outer product of
    # G's middle column into every position
    k0 = np.zeros((3, 3, 1, 1), np.float32)
    k0[1, 1, 0, 0] = 2.0
    t0 = np.asarray(transform_weights(k0)).reshape(4, 4)
    col = np.asarray([0.0, 0.5, -0.5, 0.0])
    np.testing.assert_allclose(t0, 2.0 * np.outer(col, col), atol=1e-6)


def test_winograd_int8_tracks_direct_int8():
    """The int8 variant loses 2 bits to the u requant; it must still track
    the direct int8 conv closely relative to activation magnitudes."""
    rng = np.random.default_rng(2)
    s_x = 0.05
    x_q = jnp.asarray(rng.integers(-127, 128, (2, 16, 16, 16)).astype(np.int8))
    k = rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1

    # direct int8 path: per-out-channel weights
    ws = np.maximum(np.abs(k).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = jnp.asarray(np.clip(np.round(k / ws), -127, 127).astype(np.int8))
    y_direct = np.asarray(jax.lax.conv_general_dilated(
        x_q, kq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)).astype(np.float32) * (ws * s_x)

    wq, rescale = quantize_winograd_weights(k, int8_u_scales(s_x))
    y_wino = np.asarray(winograd_conv_int8(x_q, s_x, wq, rescale))

    ref_mag = np.abs(y_direct).max()
    err = np.abs(y_wino - y_direct).max()
    assert err < 0.03 * ref_mag, (err, ref_mag)
    # and both track the exact f32 conv
    y_f32 = np.asarray(_direct(x_q.astype(jnp.float32) * s_x, jnp.asarray(k)))
    assert np.abs(y_wino - y_f32).max() < 0.05 * np.abs(y_f32).max()


def test_winograd_odd_sizes_rejected_shapewise():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    out = winograd_conv(x, k)  # even dims fine
    assert out.shape == (1, 10, 10, 4)


def test_requant_rounding():
    """u/4 requant must round-half-away-from-zero on the magnitude for the
    full exact-u range — a signed shift floors negatives one step too low."""
    from tpusr.core.winograd import _requant_u4

    t = jnp.arange(-508, 509, dtype=jnp.int32)
    got = np.asarray(_requant_u4(t))
    want = np.clip(np.sign(t) * ((np.abs(t) + 2) // 4), -127, 127)
    np.testing.assert_array_equal(got, want)
    # spot values: round(t/4) half-away
    for tv, rv in ((-4, -1), (-1, 0), (-2, -1), (-6, -2), (2, 1), (6, 2)):
        assert int(np.asarray(_requant_u4(jnp.int32(tv)))) == rv, (tv, rv)


def test_winograd_odd_sizes_raise():
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    x_odd = jnp.asarray(rng.standard_normal((1, 11, 10, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="even"):
        winograd_conv(x_odd, k)
    xq = jnp.zeros((1, 10, 11, 4), jnp.int8)
    wq, rescale = quantize_winograd_weights(np.asarray(k), int8_u_scales(0.1))
    with pytest.raises(ValueError, match="even"):
        winograd_conv_int8(xq, 0.1, wq, rescale)
