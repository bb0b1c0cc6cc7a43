"""Pallas TPU kernel: fast non-local means.

NLM is the least XLA-shaped of the classic algorithms (SURVEY.md §7): a
169-offset search window with data-dependent weights. The jnp formulation
(tpusr.classic.algorithms.nl_means_denoise) scans offsets with per-iteration
convs, bouncing the accumulator through HBM each step. This kernel keeps the
padded image, the squared-difference buffer, and both accumulators resident in
VMEM for the whole search: one ``fori_loop`` over a scalar-prefetched offset
table, separable 5x5 box sums as shifted adds on the VPU, no HBM traffic until
the final write.

Math parity with the scan version (skimage fast_mode): for every offset q-p,
d2 = box5x5_mean((x - shift(x))^2), w = exp(-max(d2 - 2*sigma^2, 0)/h^2),
out = (x + sum w * shift(x)) / (1 + sum w).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nlm_kernel(x_ref, p_ref, out_ref, num_ref, den_ref, d_ref, row_ref,
                *, H, W, pad, box, d):
    """Lane-dim (dx) offsets are statically unrolled (Mosaic requires static
    lane slicing); sublane-dim (dy) offsets run in a fori_loop with a dynamic
    sublane start. The (0,0) offset falls out of the patch formula with w=1 —
    exactly the reference's center-pixel weight — so no special case."""
    half = box // 2
    a0 = pad - half  # top-left of the box-extended window at offset 0

    num_ref[:] = jnp.zeros((H, W), jnp.float32)
    den_ref[:] = jnp.zeros((H, W), jnp.float32)

    sig2 = p_ref[0, 0]           # sigma^2
    inv_h2 = p_ref[0, 1]         # 1 / h^2

    x0 = x_ref[a0:a0 + H + box - 1, a0:a0 + W + box - 1]

    # Fully static unroll: Mosaic requires static lane slices and 8-aligned
    # dynamic sublane starts, so both offset loops unroll at trace time
    # ((2d+1)^2 = 169 iterations of pure VPU work, all resident in VMEM).
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            xs = x_ref[a0 + dy:a0 + dy + H + box - 1,
                       a0 + dx:a0 + dx + W + box - 1]
            d_ref[:] = (x0 - xs) * (x0 - xs)

            acc = d_ref[0:H, :]
            for u in range(1, box):
                acc = acc + d_ref[u:u + H, :]
            row_ref[:] = acc

            box_sum = row_ref[:, 0:W]
            for v in range(1, box):
                box_sum = box_sum + row_ref[:, v:v + W]
            d2 = box_sum * (1.0 / (box * box))

            w = jnp.exp(-jnp.maximum(d2 - 2.0 * sig2, 0.0) * inv_h2)
            shifted = x_ref[pad + dy:pad + dy + H, pad + dx:pad + dx + W]
            num_ref[:] = num_ref[:] + w * shifted
            den_ref[:] = den_ref[:] + w

    out_ref[:] = num_ref[:] / den_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("patch_size", "patch_distance", "interpret"))
def nlm_denoise_pallas(img01: jnp.ndarray, sigma, h,
                       patch_size: int = 5, patch_distance: int = 6,
                       interpret: bool = False):
    """Fast NLM on a [0,1] grayscale image — single-kernel TPU implementation.

    Holds the whole image in VMEM; suitable for the reference's image sizes
    (up to ~1k x 1k in f32 within the 16 MB budget). Falls back to the scan
    implementation for larger inputs (see tpusr.classic.algorithms).
    """
    H, W = img01.shape
    box = patch_size
    d = patch_distance
    pad = d + box // 2
    x = jnp.pad(img01.astype(jnp.float32), pad, mode="reflect")

    sig2 = jnp.asarray(sigma, jnp.float32) ** 2
    inv_h2 = 1.0 / jnp.maximum(jnp.asarray(h, jnp.float32) ** 2, 1e-12)
    p = jnp.stack([sig2, inv_h2]).reshape(1, 2)

    kernel = functools.partial(_nlm_kernel, H=H, W=W, pad=pad, box=box, d=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,  # CPU tests run the kernel interpreted
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),         # padded image
            pl.BlockSpec(memory_space=pltpu.SMEM),         # (1,2) params
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.float32),               # num
            pltpu.VMEM((H, W), jnp.float32),               # den
            pltpu.VMEM((H + box - 1, W + box - 1), jnp.float32),  # diff^2
            pltpu.VMEM((H, W + box - 1), jnp.float32),     # row sums
        ],
    )(x, p)
