"""Patch extraction and overlap-add reconstruction as fused XLA ops.

The reference's inference hot path is: reflect-pad -> python double-loop patch
extraction -> batched predict -> python overlap-add with per-pixel weight
averaging (``SRCNN_model.py:149-188``, ``EDSR_model.py:214-256``,
``ESRGAN_model.py:883-921``). Here both ends move on-device:

- ``patchify``: one ``conv_general_dilated_patches`` call (an XLA gather the TPU
  backend tiles well) producing the (nH*nW, p, p, C) patch batch.
- ``overlap_add``: when stride | patch (every reference config: 24/12, 48/24,
  96/48), the scatter-add becomes k^2 dense shifted adds over an (s, s) block
  grid — no scatter at all, fully fusable. A scan-based fallback covers
  non-divisible strides.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["patch_grid_size", "patchify", "overlap_add", "overlap_weight"]


def patch_grid_size(h: int, w: int, patch: int, stride: int) -> tuple[int, int]:
    """Number of patch rows/cols for a sliding window (VALID coverage)."""
    return (h - patch) // stride + 1, (w - patch) // stride + 1


def patchify(image: jnp.ndarray, patch: int, stride: int) -> jnp.ndarray:
    """(H, W, C) -> (nH*nW, patch, patch, C) sliding-window patches.

    Row-major patch order matches the reference's double loop
    (``SRCNN_model.py:156-160``).

    Fast path (stride | patch — every reference config): pure
    reshape/slice/stack block assembly, zero FLOPs, bandwidth-bound. The
    general case is a vmapped dynamic-slice gather. (A conv-patches
    formulation was 10x slower on TPU: XLA lowers it to a dense conv with a
    patch-sized identity kernel.)
    """
    h, w, c = image.shape
    nh, nw = patch_grid_size(h, w, patch, stride)

    if patch % stride == 0:
        s = stride
        k = patch // s
        bh, bw = h // s, w // s
        usable = image[: bh * s, : bw * s, :]
        blocks = usable.reshape(bh, s, bw, s, c).transpose(0, 2, 1, 3, 4)
        # patches[i, j, di*s:(di+1)*s, dj*s:(dj+1)*s] = blocks[i+di, j+dj]
        rows = []
        for di in range(k):
            row = [blocks[di : di + nh, dj : dj + nw] for dj in range(k)]
            rows.append(jnp.stack(row, axis=3))  # (nh, nw, s, k, s, c)
        grid = jnp.stack(rows, axis=2)  # (nh, nw, k, s, k, s, c)
        return grid.reshape(nh * nw, patch, patch, c)

    ii = np.repeat(np.arange(nh) * stride, nw)
    jj = np.tile(np.arange(nw) * stride, nh)
    pos = jnp.asarray(np.stack([ii, jj], axis=1))

    def get(ij):
        return jax.lax.dynamic_slice(image, (ij[0], ij[1], 0), (patch, patch, c))

    return jax.vmap(get)(pos)


def _overlap_add_blocks(grid: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Fast path: patch = k*stride. grid is (nH, nW, p, p, C)."""
    nh, nw, p, _, c = grid.shape
    k = p // stride
    s = stride
    sub = grid.reshape(nh, nw, k, s, k, s, c)
    out = jnp.zeros((nh + k - 1, nw + k - 1, s, s, c), grid.dtype)
    for di in range(k):
        for dj in range(k):
            out = out.at[di : di + nh, dj : dj + nw].add(sub[:, :, di, :, dj, :, :])
    bh, bw = nh + k - 1, nw + k - 1
    return jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(bh * s, bw * s, c)


def _overlap_add_scan(grid: jnp.ndarray, stride: int, out_h: int, out_w: int) -> jnp.ndarray:
    """General fallback: serial scatter-add over patches via lax.scan."""
    nh, nw, p, _, c = grid.shape
    patches = grid.reshape(nh * nw, p, p, c)
    ii = np.repeat(np.arange(nh) * stride, nw)
    jj = np.tile(np.arange(nw) * stride, nh)
    pos = jnp.asarray(np.stack([ii, jj], axis=1))

    def body(acc, xs):
        patch, ij = xs
        cur = jax.lax.dynamic_slice(acc, (ij[0], ij[1], 0), (p, p, c))
        return jax.lax.dynamic_update_slice(acc, cur + patch, (ij[0], ij[1], 0)), None

    acc0 = jnp.zeros((out_h, out_w, c), grid.dtype)
    acc, _ = jax.lax.scan(body, acc0, (patches, pos))
    return acc


@functools.lru_cache(maxsize=256)
def _overlap_weight_np(nh: int, nw: int, patch: int, stride: int) -> np.ndarray:
    """Per-pixel patch-coverage count over the padded canvas (host, cached)."""
    out_h = (nh - 1) * stride + patch
    out_w = (nw - 1) * stride + patch
    wt = np.zeros((out_h, out_w), dtype=np.float32)
    for i in range(nh):
        for j in range(nw):
            wt[i * stride : i * stride + patch, j * stride : j * stride + patch] += 1.0
    return wt


def overlap_weight(nh: int, nw: int, patch: int, stride: int) -> np.ndarray:
    return _overlap_weight_np(nh, nw, patch, stride)


def overlap_add(
    patches: jnp.ndarray,
    grid_hw: tuple[int, int],
    stride: int,
    crop_hw: tuple[int, int] | None = None,
    average: bool = True,
) -> jnp.ndarray:
    """Reconstruct (H, W, C) from (nH*nW, p, p, C) patches by overlap-averaging.

    Mirrors ``reconstruct_from_patches`` (SRCNN_model.py:164-188): sum patch
    contributions, divide by the per-pixel coverage count (0 where uncovered),
    crop to `crop_hw`. Clipping is left to the caller (models clip to their own
    output ranges).
    """
    nh, nw = grid_hw
    n, p, _, c = patches.shape
    if n != nh * nw:
        raise ValueError(f"patch count {n} != grid {nh}x{nw}")
    grid = patches.reshape(nh, nw, p, p, c)
    out_h = (nh - 1) * stride + p
    out_w = (nw - 1) * stride + p

    if p % stride == 0:
        recon = _overlap_add_blocks(grid, stride)
    else:
        recon = _overlap_add_scan(grid, stride, out_h, out_w)

    if average:
        wt = jnp.asarray(_overlap_weight_np(nh, nw, p, stride), recon.dtype)
        recon = jnp.where(wt[..., None] > 0, recon / wt[..., None], 0.0)

    if crop_hw is not None:
        recon = recon[: crop_hw[0], : crop_hw[1], :]
    return recon
