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


def _nlm_kernel(dy_ref, dx_ref, x_ref, p_ref, out_ref, num_ref, den_ref,
                d_ref, row_ref, *, H, W, pad, box):
    """One fori_loop over the 169-offset table. Mosaic forbids unaligned
    dynamic slicing of tiled dims, so each offset is realized as two dynamic
    circular rotates (``pltpu.roll``) of the whole padded array followed by
    static slices; |dy|,|dx| <= d < pad, so wrapped rows/cols never reach the
    windows in use. The (0,0) offset is skipped — the center pixel carries
    weight 1 in the accumulator init, matching the reference/skimage."""
    half = box // 2
    a0 = pad - half  # top-left of the box-extended window at offset 0

    center = x_ref[pad:pad + H, pad:pad + W]
    num_ref[:] = center
    den_ref[:] = jnp.ones((H, W), jnp.float32)

    sig2 = p_ref[0, 0]           # sigma^2
    inv_h2 = p_ref[0, 1]         # 1 / h^2

    x0 = x_ref[a0:a0 + H + box - 1, a0:a0 + W + box - 1]
    n_off = dy_ref.shape[0]

    def body(i, _):
        # dy_ref/dx_ref hold (-offset) mod dim: Mosaic miscompiles negative
        # dynamic axis-0 rolls followed by unaligned slices, so the host
        # precomputes the equivalent non-negative rotate amounts.
        dy = dy_ref[i]
        dx = dx_ref[i]
        rolled = pltpu.roll(pltpu.roll(x_ref[:], dy, axis=0), dx, axis=1)
        xs = rolled[a0:a0 + H + box - 1, a0:a0 + W + box - 1]
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
        shifted = rolled[pad:pad + H, pad:pad + W]
        num_ref[:] = num_ref[:] + w * shifted
        den_ref[:] = den_ref[:] + w
        return 0

    jax.lax.fori_loop(0, n_off, body, 0)
    out_ref[:] = num_ref[:] / den_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("patch_size", "patch_distance", "interpret"))
def nlm_denoise_pallas(img01: jnp.ndarray, sigma, h,
                       patch_size: int = 5, patch_distance: int = 6,
                       interpret: bool = False):
    """Fast NLM on a [0,1] grayscale image — single-kernel TPU implementation.

    Holds the whole image in VMEM; suitable for the reference's image sizes
    (~6 image-sized f32 buffers stay resident, ~25 B/pixel, so ~512x512 fits
    the 16 MB budget; the dispatch gate enforces this). Falls back to the scan
    implementation for larger inputs (see tpusr.classic.algorithms).
    """
    H, W = img01.shape
    box = patch_size
    d = patch_distance
    pad = d + box // 2
    x = jnp.pad(img01.astype(jnp.float32), pad, mode="reflect")
    # dynamic rotates need tile-aligned operands: pad to (8k, 128k) with
    # trailing zeros (content sits top-left; the rolled windows in use never
    # read past row/col H+2*pad-1, see kernel docstring)
    ah = -(-x.shape[0] // 8) * 8
    aw = -(-x.shape[1] // 128) * 128
    x = jnp.pad(x, ((0, ah - x.shape[0]), (0, aw - x.shape[1])))

    offs = np.asarray([(dy, dx) for dy in range(-d, d + 1)
                       for dx in range(-d, d + 1) if (dy, dx) != (0, 0)],
                      dtype=np.int32)
    # non-negative rotate amounts (see kernel body comment)
    dy = jnp.asarray((-offs[:, 0]) % ah, jnp.int32)
    dx = jnp.asarray((-offs[:, 1]) % aw, jnp.int32)
    sig2 = jnp.asarray(sigma, jnp.float32) ** 2
    inv_h2 = 1.0 / jnp.maximum(jnp.asarray(h, jnp.float32) ** 2, 1e-12)
    p = jnp.stack([sig2, inv_h2]).reshape(1, 2)

    kernel = functools.partial(_nlm_kernel, H=H, W=W, pad=pad, box=box)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # dy/dx offset tables land in SMEM
        grid=(1,),
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
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,  # CPU tests run the kernel interpreted
        grid_spec=grid_spec,
    )(dy, dx, x, p)
