"""EDSR fused/polyphase tail parity (the round-2 perf path in bench.py).

The upsample tail (up convs + pixel shuffles + final conv) is entirely linear
(EDSR_model.py:96-125), so it collapses into one composed polyphase conv; a
border band is recomputed with the chained reference path so zero-padding
semantics match exactly. These tests pin exactness at HIGHEST precision for
all reference scales.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.models import EDSR
from tpusr.models.edsr_fast import (_chained_tail, _conv, make_fused_sr_apply,
                                    make_poly_sr_apply)
from tpusr.models.layers import pixel_shuffle

HI = jax.lax.Precision.HIGHEST


def _reference(params, x, scale, n_res):
    head = _conv(params["head"], x, precision=HI)
    y = head
    for i in range(n_res):
        p = params[f"res{i}"]
        y = y + 0.1 * _conv(p["conv2"],
                            jax.nn.relu(_conv(p["conv1"], y, precision=HI)),
                            precision=HI)
    y = _conv(params["body"], y, precision=HI) + head
    return jnp.clip(_chained_tail(params, y, scale, precision=HI), 0.0, 1.0)


@pytest.mark.parametrize("scale,hw", [(2, 24), (3, 16), (4, 32)])
def test_fused_tail_exact_incl_borders(scale, hw):
    m = EDSR(scale_factor=scale, num_res_blocks=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32))
    x = jnp.asarray(np.random.default_rng(1).random((2, hw, hw, 3), np.float32))
    want = np.asarray(_reference(v["params"], x, scale, 2))
    fn, s = make_fused_sr_apply(v["params"], scale, dtype=jnp.float32,
                                precision=HI)
    got = np.asarray(pixel_shuffle(fn(x), s))
    # f32 round-off: the composed conv accumulates K=9*f*n_stages products in
    # one sum vs the chained path's staged sums
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("scale,hw", [(2, 24), (4, 32)])
def test_poly_tail_exact(scale, hw):
    """Single-stage polyphase variant (tail conv refactored pre-shuffle)."""
    m = EDSR(scale_factor=scale, num_res_blocks=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32))
    x = jnp.asarray(np.random.default_rng(2).random((1, hw, hw, 3), np.float32))
    want = np.asarray(m.apply(v, x))
    fn, r = make_poly_sr_apply(v["params"], scale, dtype=jnp.float32)
    got = np.asarray(pixel_shuffle(fn(x), r))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_tail_module_level_default_precision():
    """Against the real module at default precision the fused path agrees to
    accumulated rounding noise (both run the same bf16-class MXU ops)."""
    m = EDSR(scale_factor=4, num_res_blocks=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 3), np.float32))
    want = np.asarray(m.apply(v, x))
    fn, s = make_fused_sr_apply(v["params"], 4, dtype=jnp.float32)
    got = np.asarray(pixel_shuffle(fn(x), s))
    # default TPU conv precision mangles inputs to bf16; on CPU this is exact
    tol = 1e-4 if jax.default_backend() == "cpu" else 0.1
    np.testing.assert_allclose(got, want, atol=tol)


def test_pallas_conv_int8_bit_exact():
    """The pallas im2col conv (kept as a documented reference; XLA's conv
    emitter won the benchmark) stays bit-exact with the XLA requant path."""
    if jax.default_backend() == "cpu":
        interpret = True
    else:
        interpret = False
    from tpusr.core.pallas_conv import conv3x3_int8_requant

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 12, 12, 128)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 128)), jnp.int8)
    rs = jnp.asarray(rng.random(128) * 0.01, jnp.float32)
    b = jnp.asarray(rng.random(128) + 0.5, jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    want = np.asarray(jnp.clip(y.astype(jnp.float32) * rs + b,
                               0, 127).astype(jnp.int8))
    got = np.asarray(conv3x3_int8_requant(x, w, rs, b, interpret=interpret))
    np.testing.assert_array_equal(got, want)


def test_dualize_conv_kernel_exact():
    """Dual-pixel refactor computes the SAME sums as the 3x3 SAME conv
    (int8 exact; kept as a building block — see PERF.md round 2)."""
    from tpusr.models.edsr_fast import _conv_dual, dualize_conv_kernel

    rng = np.random.default_rng(7)
    x = rng.integers(-127, 128, (2, 10, 12, 8)).astype(np.int8)
    k = rng.integers(-127, 128, (3, 3, 8, 16)).astype(np.int8)
    b = np.zeros(16, np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(k, jnp.float32), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k2 = jnp.asarray(dualize_conv_kernel(k.astype(np.float32)))
    got = _conv_dual(k2, jnp.asarray(b), jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
