"""int8 EDSR serving path: calibration, quantized forward fidelity vs the
f32 fused path, and geometry parity with EDSR.apply (pixel_shuffle of the
polyphase output). Protocol-scale decision impact is covered by the serving
gate (GATE.json)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.metrics.image import psnr
from tpusr.models import EDSR
from tpusr.models.edsr_fast import make_fused_sr_apply
from tpusr.models.edsr_quant import (calibrate_edsr, make_fused_sr_apply_int8,
                                     quantize_edsr)
from tpusr.models.layers import pixel_shuffle


@pytest.mark.parametrize(
    "scale", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_int8_sr_tracks_f32(scale):
    m = EDSR(scale_factor=scale, num_res_blocks=2, num_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    x = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3),
                                                    dtype=np.float32))
    ref = m.apply(v, x)

    f32_fn, s1 = make_fused_sr_apply(v["params"], scale, dtype=jnp.float32)
    q_fn, s2 = make_fused_sr_apply_int8(v["params"], scale, sample_lr=x)
    assert s1 == s2
    sr_f32 = pixel_shuffle(f32_fn(x), s1)
    sr_q = pixel_shuffle(q_fn(x), s2)
    assert sr_q.shape == ref.shape == sr_f32.shape
    assert 0.0 <= float(sr_q.min()) and float(sr_q.max()) <= 1.0
    # random weights are the hardest PTQ case; trained nets measure ~27 dB
    # at protocol scale (GATE.json)
    drift = float(jnp.mean(psnr(sr_f32, sr_q)))
    assert drift > 30.0, drift


def test_int8_carry_matches_bf16_glue():
    """The fused ReLU+requant carry (int8 conv1->conv2 handoff) must track
    the default bf16-glue path closely — it changes only rounding inside
    each res block, not the quantization grid (PERF.md round 3: measured
    throughput-neutral on-chip, kept as a documented variant)."""
    m = EDSR(scale_factor=2, num_res_blocks=2, num_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    x = jnp.asarray(np.random.default_rng(5).random((2, 16, 16, 3),
                                                    dtype=np.float32))
    fn_a, s_a = make_fused_sr_apply_int8(v["params"], 2, sample_lr=x)
    fn_b, s_b = make_fused_sr_apply_int8(v["params"], 2, sample_lr=x,
                                         int8_carry=True)
    assert s_a == s_b
    sr_a = pixel_shuffle(fn_a(x), s_a)
    sr_b = pixel_shuffle(fn_b(x), s_b)
    # random weights, differs only in per-block rounding: ~39 dB mutual
    # agreement here; identical PSNR-vs-f32 at bench geometry (PERF.md)
    assert float(jnp.mean(psnr(sr_a, sr_b))) > 35.0


def test_calibration_scales_cover_every_conv():
    m = EDSR(scale_factor=2, num_res_blocks=3, num_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 3),
                                                    dtype=np.float32))
    scales = calibrate_edsr(v["params"], x)
    want = {"head", "body", "tail"} | {
        f"res{i}_conv{j}" for i in range(3) for j in (1, 2)}
    assert set(scales) == want
    assert all(s > 0 for s in scales.values())

    q = quantize_edsr(v["params"], 2, scales)
    assert set(q["layers"]) == want
    for layer in q["layers"].values():
        assert layer["kernel_q"].dtype == jnp.int8
        # quantized kernels must stay on device types (no host round trip)
        assert isinstance(layer["kernel_q"], jax.Array)


def test_int8_requires_calibration_input():
    m = EDSR(scale_factor=2, num_res_blocks=1, num_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    with pytest.raises(ValueError, match="calib"):
        make_fused_sr_apply_int8(v["params"], 2)
