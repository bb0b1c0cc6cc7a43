"""Post-training int8 quantization for the EDSR SR inference path.

Measured on v5e at the bench load (batch 128, 128x128x64, 34 chained convs):
bf16 40.8 ms (65% of bf16 peak) vs int8 25.9 ms (51% of int8 peak) — 1.57x,
the same ratio the VGG16 classifier showed (PERF.md). 2x-channel padding to
fill the 128 MXU lanes was re-probed and loses (0.61x useful-MAC rate).

Design (mixed-precision trunk — no accumulated quantization error):
- the running activation tensor stays bf16 end to end (residual adds, 0.1
  scaling, the global skip are exact in bf16);
- each conv quantizes its INPUT on the fly (per-tensor symmetric scale,
  calibrated max-abs on a f32 forward), runs int8 x int8 -> int32 on the
  MXU, and dequantizes with one fused per-output-channel f32 rescale + bias;
- the fused linear tail (edsr_fast.fused_tail_kernel — the whole upsample
  tail as ONE composed conv) is quantized the same way;
- the thin border-band correction slabs stay bf16 (negligible cost, keeps
  the chained-tail border semantics).

Like the classifier int8 path this is an opt-in serving mode; bf16/f32 stays
the parity path. Accuracy is gated in tests by PSNR(int8 SR, f32 SR) and in
the protocol-scale harness by end-to-end vote agreement.

Reference inference semantics being served: EDSR_model.py:189-315.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.edsr_fast import (_chained_tail, _conv, _interleaved_to_poly,
                                    fused_tail_kernel)

_DN = ("NHWC", "HWIO", "NHWC")


def _maxabs(x) -> float:
    return float(jnp.max(jnp.abs(x)))


def calibrate_edsr(params: dict, sample_lr, res_scaling: float = 0.1) -> dict:
    """Run the f32 forward on a calibration batch and record every conv
    INPUT's symmetric int8 scale (max-abs / 127). Keys: 'head',
    'res{i}_conv1', 'res{i}_conv2', 'body', 'tail'."""
    x = jnp.asarray(np.asarray(sample_lr, np.float32))
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    scales = {"head": max(_maxabs(x) / 127.0, 1e-8)}
    n_res = len([k for k in params if k.startswith("res")])
    head = _conv(p32["head"], x)
    y = head
    for i in range(n_res):
        p = p32[f"res{i}"]
        scales[f"res{i}_conv1"] = max(_maxabs(y) / 127.0, 1e-8)
        t = jax.nn.relu(_conv(p["conv1"], y))
        scales[f"res{i}_conv2"] = max(_maxabs(t) / 127.0, 1e-8)
        t = _conv(p["conv2"], t)
        y = y + res_scaling * t
    scales["body"] = max(_maxabs(y) / 127.0, 1e-8)
    y = _conv(p32["body"], y) + head
    scales["tail"] = max(_maxabs(y) / 127.0, 1e-8)
    return scales


def _quantize_kernel(k):
    """(kh, kw, cin, cout) -> (int8 kernel, per-cout f32 w_scale); jnp ops so
    device params quantize on device (the dev tunnel makes host round-trips
    of full param trees cost minutes)."""
    k = jnp.asarray(k).astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
    return kq, w_scale.astype(jnp.float32)


def quantize_edsr(params: dict, scale_factor: int, act_scales: dict) -> dict:
    """Per-output-channel int8 kernels + fused rescale vectors for the head,
    res-block, body, and composed-tail convs. Consumed by
    ``make_fused_sr_apply_int8``."""
    p32 = jax.tree.map(lambda a: jnp.asarray(a).astype(jnp.float32), params)
    w_eff, b_eff, pad = fused_tail_kernel(p32, scale_factor)

    q = {"layers": {}, "pad": pad, "act_scales": dict(act_scales)}

    def add(name, kernel, bias):
        kq, ws = _quantize_kernel(kernel)
        s_in = act_scales[name]
        q["layers"][name] = {
            "kernel_q": kq,
            "rescale": (s_in * ws).astype(jnp.float32),
            "bias": jnp.asarray(bias).astype(jnp.float32),
            "inv_s_in": jnp.float32(1.0 / s_in),
        }

    add("head", p32["head"]["kernel"], p32["head"]["bias"])
    n_res = len([k for k in params if k.startswith("res")])
    for i in range(n_res):
        add(f"res{i}_conv1", p32[f"res{i}"]["conv1"]["kernel"],
            p32[f"res{i}"]["conv1"]["bias"])
        add(f"res{i}_conv2", p32[f"res{i}"]["conv2"]["kernel"],
            p32[f"res{i}"]["conv2"]["bias"])
        # int8-carry requant for conv1 -> conv2 (same trick as the VGG16
        # classifier, quant.py:76-84): conv1's output is ReLU'd and then
        # immediately re-quantized for conv2, so its int32 accumulator can be
        # rescaled STRAIGHT to conv2's int8 input grid — clip(.,0,127) is the
        # ReLU, +0.5 in the bias makes the truncating cast round-half-up —
        # skipping the bf16 round trip + separate round/mult per res block.
        l1 = q["layers"][f"res{i}_conv1"]
        s_in2 = act_scales[f"res{i}_conv2"]
        l1["rescale_carry"] = (l1["rescale"] / s_in2).astype(jnp.float32)
        l1["bias_carry"] = (l1["bias"] / s_in2 + 0.5).astype(jnp.float32)
    add("body", p32["body"]["kernel"], p32["body"]["bias"])
    add("tail", w_eff, b_eff)
    q["n_res"] = n_res
    return q


def _qconv(layer: dict, x: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Quantize input -> int8 MXU conv -> fused f32 dequant (+bias)."""
    y = jax.lax.conv_general_dilated(
        _quantize_in(layer, x), layer["kernel_q"], (1, 1), "SAME",
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return _dequant(layer, y, out_dtype)


def _qconv_int8_out(layer: dict, x8: jnp.ndarray) -> jnp.ndarray:
    """int8 input -> int8 conv -> ReLU + requant fused into one rescale
    (clip to [0,127] is the ReLU; truncating cast rounds half-up via the
    +0.5 folded into ``bias_carry``). Output is the NEXT conv's int8 input."""
    y = jax.lax.conv_general_dilated(
        x8, layer["kernel_q"], (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * layer["rescale_carry"] + layer["bias_carry"]
    return jnp.clip(yf, 0.0, 127.0).astype(jnp.int8)


def _quantize_in(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) * layer["inv_s_in"]),
                    -127, 127).astype(jnp.int8)


def _dequant(layer: dict, y_i32: jnp.ndarray, out_dtype=jnp.bfloat16):
    return (y_i32.astype(jnp.float32) * layer["rescale"]
            + layer["bias"]).astype(out_dtype)


def make_fused_sr_apply_int8(params: dict, scale_factor: int,
                             sample_lr=None, act_scales: dict | None = None,
                             res_scaling: float = 0.1,
                             border_correction: bool = True,
                             int8_carry: bool = False):
    """int8 twin of ``edsr_fast.make_fused_sr_apply``: same fused-linear-tail
    polyphase forward, every conv on the int8 MXU path, bf16 trunk.

    Returns (fn, s): ``fn(x) -> y_poly`` clipped to [0,1];
    ``pixel_shuffle(y_poly, s)`` is the SR image. Pass either precomputed
    ``act_scales`` (from ``calibrate_edsr``) or a ``sample_lr`` calibration
    batch.

    ``border_correction=False`` skips the chained-tail border band (the
    composed conv's zero padding then differs from the reference's
    per-stage padding within ``pad`` cells of each image border — interior
    pixels are unaffected); measured e2e gain is recorded in PERF.md.

    ``int8_carry=True`` keeps the res-block conv1->conv2 handoff in int8
    (ReLU+requant fused into one rescale, like the VGG16 classifier's
    ``quant.py`` carry) instead of round-tripping through bf16. Measured
    throughput-neutral at the bench geometry (PERF.md round 3: 44.3 vs
    44.4 ms/iter, identical PSNR) — XLA already fuses the bf16 glue — so
    the default stays the bench-validated bf16-glue path.
    """
    s = scale_factor
    if act_scales is None:
        if sample_lr is None:
            raise ValueError("need act_scales or a sample_lr calibration batch")
        act_scales = calibrate_edsr(params, sample_lr, res_scaling)
    q = quantize_edsr(params, s, act_scales)
    pad = q["pad"]
    slab = 2 * pad + 1
    # the bf16 copy feeds only the chained-tail border slabs — cast just the
    # tail convs, and only when the correction actually runs
    cast = (jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        {k: params[k] for k in ("up0", "up1", "tail") if k in params})
        if border_correction else None)

    def body_out(x):
        head = _qconv(q["layers"]["head"], x)
        y = head
        for i in range(q["n_res"]):
            l1, l2 = q["layers"][f"res{i}_conv1"], q["layers"][f"res{i}_conv2"]
            if int8_carry:
                # conv1 -> (fused ReLU+requant, stays int8) -> conv2: no bf16
                # round trip inside the block (see quantize_edsr)
                t8 = _qconv_int8_out(l1, _quantize_in(l1, y))
                z = jax.lax.conv_general_dilated(
                    t8, l2["kernel_q"], (1, 1), "SAME",
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                t = _dequant(l2, z)
            else:
                t = jax.nn.relu(_qconv(l1, y))
                t = _qconv(l2, t)
            y = y + jnp.bfloat16(res_scaling) * t
        return _qconv(q["layers"]["body"], y) + head

    def chained_poly(yslab):
        out = _chained_tail(cast, yslab, s)
        return _interleaved_to_poly(out, s)

    def fn(x):
        y = body_out(x)
        z = _qconv(q["layers"]["tail"], y, out_dtype=jnp.float32)
        if border_correction:
            # border-band correction: chained zero-padding semantics (bf16)
            top = chained_poly(y[:, :slab])[:, :pad].astype(jnp.float32)
            bot = chained_poly(y[:, -slab:])[:, -pad:].astype(jnp.float32)
            left = chained_poly(y[:, :, :slab])[:, :, :pad].astype(jnp.float32)
            right = chained_poly(y[:, :, -slab:])[:, :, -pad:].astype(jnp.float32)
            z = z.at[:, :pad].set(top).at[:, -pad:].set(bot)
            z = z.at[:, :, :pad].set(left).at[:, :, -pad:].set(right)
        return jnp.clip(z, 0.0, 1.0)

    return fn, s
