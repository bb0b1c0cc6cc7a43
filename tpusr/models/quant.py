"""Post-training int8 quantization for the VGG16 classifier inference path.

v5e executes int8 convs on the MXU at ~1.6x the bf16 rate for this stack
(measured: 427 vs 273 img/s at the bench's patch load, PERF.md). This module
provides a drop-in quantized forward for ``VGG16Classifier``:

- weights: symmetric per-output-channel int8 (w_q = round(w / s_w));
- activations: symmetric per-tensor int8 with scales calibrated on sample
  data (max-abs over a calibration batch, f32 reference forward);
- each conv runs int8 x int8 -> int32 on the MXU, then one fused f32 rescale
  (+ bias, + ReLU) requantizes to the next layer's int8 grid;
- the head (GAP -> Dense 256 -> Dense softmax) stays in f32 — negligible cost.

This is an opt-in serving mode: fp32/bf16 remains the parity path (BASELINE
requires fp32-identical logits for parity claims; quantized logits differ by
design). Accuracy: patch-vote decisions are measured against the f32 path in
tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.vgg import _VGG16_CFG as _CFG  # one architecture table


def _conv_names():
    return [f"block{b}_conv{c}" for b, n, _f in _CFG for c in range(1, n + 1)]


def calibrate_vgg16(params: dict, sample_patches):
    """Collect per-layer activation max-abs on a f32 reference forward.

    Returns {layer_name: scale} where scale maps activations to int8
    (x_q = round(x / scale)). The input scale is keyed as '__input__'.
    """
    x = jnp.asarray(np.asarray(sample_patches, np.float32))
    scales = {"__input__": max(float(jnp.max(jnp.abs(x))) / 127.0, 1e-8)}
    bb = params["vgg16"]
    for block, n_convs, _f in _CFG:
        for ci in range(1, n_convs + 1):
            name = f"block{block}_conv{ci}"
            k = bb[name]["kernel"].astype(jnp.float32)
            b = bb[name]["bias"].astype(jnp.float32)
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            x = jnp.maximum(x, 0.0)
            scales[name] = max(float(jnp.max(x)) / 127.0, 1e-8)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return scales


def quantize_vgg16(params: dict, act_scales: dict):
    """Quantize backbone weights to per-channel int8 and precompute the fused
    rescale factors. Returns a pytree consumed by ``quantized_vgg16_apply``."""
    bb = params["vgg16"]
    q = {"act_scales": dict(act_scales), "layers": {}}
    prev_scale = act_scales["__input__"]
    for block, n_convs, _f in _CFG:
        for ci in range(1, n_convs + 1):
            name = f"block{block}_conv{ci}"
            # jnp ops throughout: device params quantize ON DEVICE (a host
            # round-trip of the 59 MB backbone takes minutes on the dev
            # tunnel); numpy params work identically.
            k = jnp.asarray(bb[name]["kernel"]).astype(jnp.float32)
            b = jnp.asarray(bb[name]["bias"]).astype(jnp.float32)
            w_scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0,
                                  1e-12)
            k_q = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
            out_scale = act_scales[name]
            # y_f32 = y_int32 * prev_scale * w_scale + bias; then /out_scale.
            # +0.5 folded into the bias turns the truncating int8 cast into
            # round-half-up (values are >=0 post-ReLU) — saves a round op.
            q["layers"][name] = {
                "kernel_q": k_q,
                "rescale": (prev_scale * w_scale / out_scale
                            ).astype(jnp.float32),
                "bias_over_out": (b / out_scale + 0.5).astype(jnp.float32),
            }
            prev_scale = out_scale
    q["final_scale"] = prev_scale
    q["head"] = {"fc1": params["fc1"], "predictions": params["predictions"]}
    return q


def quantize_input(q: dict, images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float images -> the classifier's int8 input grid. Quantizing
    BEFORE patch extraction shrinks the patch tensor 4x (the pipeline's
    largest intermediate) — patch geometry is dtype-agnostic."""
    s_in = q["act_scales"]["__input__"]
    x = jnp.clip(jnp.round(images.astype(jnp.float32) / s_in), -127, 127)
    return x.astype(jnp.int8)


def int8_backbone(q: dict, x: jnp.ndarray, pool5: bool = True) -> jnp.ndarray:
    """The int8 VGG16 conv trunk shared by the per-patch path and the
    shared-trunk path (``models/vgg_trunk.py``): int8 convs with the fused
    requant grid, stride-2 max pools after blocks 1-4, and after block 5
    only when ``pool5`` (the shared trunk pools block 5 at stride 1 for
    per-patch pool parity). Input/output are int8 on ``q``'s grids."""
    for block, n_convs, _f in _CFG:
        for ci in range(1, n_convs + 1):
            layer = q["layers"][f"block{block}_conv{ci}"]
            y = jax.lax.conv_general_dilated(
                x, layer["kernel_q"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * layer["rescale"] + layer["bias_over_out"]
            # clip(...,0,127) also applies ReLU; the truncating cast rounds
            # half-up thanks to the +0.5 folded into bias_over_out
            x = jnp.clip(yf, 0.0, 127.0).astype(jnp.int8)
        if block < 5 or pool5:
            x = jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return x


def quantized_vgg16_apply(q: dict, patches: jnp.ndarray) -> jnp.ndarray:
    """int8 backbone + f32 head forward: (N, H, W, 3) [0,1] (or pre-quantized
    int8 from ``quantize_input``) -> (N, classes) probs."""
    if patches.dtype == jnp.int8:
        x = patches
    else:
        x = quantize_input(q, patches)
    x = int8_backbone(q, x, pool5=True)
    feats = x.astype(jnp.float32) * q["final_scale"]
    pooled = jnp.mean(feats, axis=(1, 2))
    h = jnp.maximum(pooled @ q["head"]["fc1"]["kernel"].astype(jnp.float32)
                    + q["head"]["fc1"]["bias"].astype(jnp.float32), 0.0)
    logits = (h @ q["head"]["predictions"]["kernel"].astype(jnp.float32)
              + q["head"]["predictions"]["bias"].astype(jnp.float32))
    return jax.nn.softmax(logits)
