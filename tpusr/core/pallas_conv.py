"""Pallas TPU kernel: 3x3 SAME conv as an im2col GEMM with a fused epilogue.

Why: XLA's int8 conv path runs the VGG16 classifier backbone at 17-52% of the
v5e int8 MXU peak (worst on the early low-channel layers, PERF.md round-2
ledger). Materializing im2col in HBM is a 9x bandwidth blowup; this kernel
builds the (M, 9*Cin) im2col matrix in VMEM per grid cell instead, runs ONE
int8xint8->int32 MXU GEMM against the (9*Cin, Cout) reshaped weights, and
applies the requantization epilogue (f32 rescale + bias(+0.5), clip to [0,127],
truncating int8 cast) before anything leaves VMEM — bit-exact with the XLA
formulation in ``tpusr.models.quant``.

Grid: one cell per group of ``ni`` images (whole padded images live in VMEM —
classifier patches are <= 96x96 so even the largest layer block fits in a few
MB). ``ni`` is chosen per layer so the GEMM M dimension is >= ~256 rows.

The bf16 variant (fused bias/ReLU epilogue, f32 accumulation) serves the EDSR
res-block convs through the same code path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_images_per_block(h: int, w: int, cin: int, cout: int,
                           n: int, itemsize: int = 1) -> int:
    """Images per grid cell: M = ni*h*w >= 256 rows, VMEM bounded ~8MB."""
    ni = 1
    while ni < n and ni * h * w < 256:
        ni *= 2
    # VMEM estimate: x block + col buffer + out block (+ weights once)
    def vmem(ni):
        x = ni * (h + 2) * (w + 2) * cin * itemsize
        col = ni * h * w * 9 * cin * itemsize
        out = ni * h * w * cout * 4
        return x + col + out
    while ni > 1 and vmem(ni) > 8 * 1024 * 1024:
        ni //= 2
    return ni


def _conv3x3_gemm_kernel(x_ref, w_ref, rs_ref, bias_ref, out_ref, col_ref, *,
                         h, w, cin, cout, ni, epilogue):
    """x_ref: (ni, h+2, w+2, cin) pre-zero-padded input block.
    col_ref: (ni*h*w, 9*cin) VMEM scratch. out_ref: (ni, h, w, cout)."""
    m = ni * h * w
    for k in range(9):
        dy, dx = divmod(k, 3)
        sl = x_ref[:, dy:dy + h, dx:dx + w, :]
        col_ref[:, k * cin:(k + 1) * cin] = sl.reshape(m, cin)
    acc = jnp.dot(col_ref[:], w_ref[:], preferred_element_type=jnp.int32
                  if x_ref.dtype == jnp.int8 else jnp.float32)
    y = epilogue(acc, rs_ref, bias_ref)
    out_ref[:] = y.reshape(ni, h, w, cout)


def _requant_epilogue(acc, rs_ref, bias_ref):
    # identical arithmetic to tpusr.models.quant.quantized_vgg16_apply:
    # f32 rescale + bias(+0.5 folded), clip [0,127] (= ReLU), truncating cast
    yf = acc.astype(jnp.float32) * rs_ref[0] + bias_ref[0]
    return jnp.clip(yf, 0.0, 127.0).astype(jnp.int8)


def _bias_relu_epilogue(acc, rs_ref, bias_ref, relu, out_dtype):
    y = acc + bias_ref[0].astype(acc.dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_int8_requant(x, w_q, rescale, bias_over_out, interpret=False):
    """3x3 SAME int8 conv + fused requantization, Pallas.

    x: (N, H, W, Cin) int8; w_q: (3, 3, Cin, Cout) int8;
    rescale/bias_over_out: (Cout,) f32 (bias includes the reference's +0.5
    round-half-up fold). Returns (N, H, W, Cout) int8 — bit-exact with the
    XLA path in ``quantized_vgg16_apply``.
    """
    n, h, w, cin = x.shape
    cout = w_q.shape[-1]
    ni = _pick_images_per_block(h, w, cin, cout, n)
    n_pad = (-n) % ni
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    nb = x.shape[0] // ni

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2d = w_q.reshape(9 * cin, cout)
    rs = rescale.reshape(1, cout)
    bias = bias_over_out.reshape(1, cout)

    kernel = functools.partial(_conv3x3_gemm_kernel, h=h, w=w, cin=cin,
                               cout=cout, ni=ni, epilogue=_requant_epilogue)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ni, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ni, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * ni, h, w, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((ni * h * w, 9 * cin), jnp.int8)],
        interpret=interpret,
    )(xp, w2d, rs, bias)
    return out[:n] if n_pad else out


@functools.partial(jax.jit,
                   static_argnames=("relu", "interpret"))
def conv3x3_bias_act(x, kernel, bias, relu=False, interpret=False):
    """3x3 SAME conv + bias (+ ReLU) for float dtypes (bf16/f32), Pallas.

    x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout); bias: (Cout,).
    Accumulates in f32 on the MXU, returns x.dtype.
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    itemsize = np.dtype(x.dtype).itemsize
    ni = _pick_images_per_block(h, w, cin, cout, n, itemsize)
    n_pad = (-n) % ni
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    nb = x.shape[0] // ni

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2d = kernel.reshape(9 * cin, cout).astype(x.dtype)
    rs = jnp.zeros((1, cout), jnp.float32)  # unused slot, keeps one kernel body
    b = bias.reshape(1, cout).astype(jnp.float32)

    epi = functools.partial(_bias_relu_epilogue, relu=relu, out_dtype=x.dtype)
    body = functools.partial(_conv3x3_gemm_kernel, h=h, w=w, cin=cin,
                             cout=cout, ni=ni, epilogue=epi)
    out = pl.pallas_call(
        body,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ni, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ni, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * ni, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((ni * h * w, 9 * cin), x.dtype)],
        interpret=interpret,
    )(xp, w2d, rs, b)
    return out[:n] if n_pad else out
