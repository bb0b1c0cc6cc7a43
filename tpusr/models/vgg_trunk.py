"""Shared-trunk patch-vote classification: one full-image VGG16 conv trunk
instead of 100 overlapping per-patch forwards.

The reference protocol (VGG16_model.py:168-270) classifies every 96x96
stride-48 patch independently, so the conv trunk recomputes each overlapping
pixel ~4x AND each patch re-pads its own borders: ~570 GFLOP/image. Running
the trunk ONCE on the (reflect-padded) full image is ~2.9x fewer MACs
(560^2 / (100 * 96^2) = 0.34) and needs no patch materialization at all.
Measured on v5e at the bench load: full-image int8 trunk 115 ms vs ~300 ms
per-patch (PERF.md round 3).

Pool alignment makes this exact w.r.t. pooling: with stride 48 and patch 96,
patch offsets are divisible by the pool grid through pool4 (48 = 3*16); only
pool5 alternates parity per patch position, handled by a stride-1 max pool +
a dilation-2 mean window + a stride-3 slice (all XLA reduce_windows, no
gathers):

    pool5_s1[r] = max(b5c3[r], b5c3[r+1])             # stride-1 max pool
    gap[r]      = mean_{t,u in 0..2} pool5_s1[r+2t]    # dilated mean window
    patch k GAP = gap[3k]                              # strided slice

The ONLY numeric difference vs the per-patch path is conv padding: each
reference patch is zero-padded by its SAME convs at its own 96x96 borders,
while the shared trunk sees the real neighboring pixels (zero padding only at
the padded-image border). This is a serving mode in the same class as int8
quantization: decisions are gated on >=99% patch-vote agreement with the
reference path at protocol scale (exactness tests in
tests/test_shared_trunk.py; trained-weight protocol-scale gate in
tpusr/tools/serving_gate.py); the per-patch path remains the parity
default.

Reference protocol being served: VGG16_model.py:168-270 (patch extraction
:216-242, batched predict :244, vote :252-270).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.core.pad import pad_amounts, reflect_pad
from tpusr.core.patches import patch_grid_size
from tpusr.models.quant import _CFG, int8_backbone, quantize_input

_DN = ("NHWC", "HWIO", "NHWC")


def trunk_geometry(h: int, w: int, patch: int, stride: int):
    """(pad_h, pad_w, n_h, n_w) for the reference patch grid, with the
    alignment preconditions the shared trunk needs."""
    if stride % 16 != 0 or patch % 32 != 0:
        raise ValueError(
            f"shared trunk needs stride % 16 == 0 and patch % 32 == 0 "
            f"(pool grids 1-4 must align); got patch={patch} stride={stride}")
    pad_h, pad_w = pad_amounts(h, w, patch, stride)
    if (h + pad_h) % 16 or (w + pad_w) % 16:
        raise ValueError("padded image must be divisible by 16")
    n_h, n_w = patch_grid_size(h + pad_h, w + pad_w, patch, stride)
    return pad_h, pad_w, n_h, n_w


def _cells_to_patch_feats(feats_s1: jnp.ndarray, patch: int, stride: int,
                          n_h: int, n_w: int) -> jnp.ndarray:
    """(N, C5-1, C5-1, 512) f32 stride-1-pooled cells -> (N, n_h, n_w, 512)
    per-patch GAP features (mean over the patch's m x m pool5 cells)."""
    m = patch // 32          # pool5 cells per patch (3 for patch 96)
    ss = stride // 16        # patch offset in /16 cells (3 for stride 48)
    gap = jax.lax.reduce_window(
        feats_s1, 0.0, jax.lax.add, (1, m, m, 1), (1, 1, 1, 1), "VALID",
        window_dilation=(1, 2, 2, 1)) / float(m * m)
    return gap[:, : (n_h - 1) * ss + 1: ss, : (n_w - 1) * ss + 1: ss, :]


def _head_probs(feats: jnp.ndarray, fc1: dict, pred: dict) -> jnp.ndarray:
    """(N, n_h, n_w, 512) -> (N, n_h*n_w, classes) softmax probs (the f32
    GAP -> Dense 256 -> Dense softmax head, VGG16_model.py:116-124)."""
    h = jnp.maximum(feats @ fc1["kernel"].astype(jnp.float32)
                    + fc1["bias"].astype(jnp.float32), 0.0)
    logits = (h @ pred["kernel"].astype(jnp.float32)
              + pred["bias"].astype(jnp.float32))
    probs = jax.nn.softmax(logits)
    n, nh, nw, c = probs.shape
    return probs.reshape(n, nh * nw, c)


def shared_trunk_probs_int8(q: dict, images: jnp.ndarray, patch: int = 96,
                            stride: int = 48) -> jnp.ndarray:
    """int8 shared-trunk patch probabilities.

    ``q`` is the ``tpusr.models.quant.quantize_vgg16`` tree (same weights and
    requant grid as the per-patch int8 path). ``images``: (N, H, W, 3) [0,1]
    f32, or pre-quantized int8 from ``quantize_input``. Returns
    (N, n_patches, classes) probs in reference patch order (row-major).
    """
    if images.dtype != jnp.int8:
        images = quantize_input(q, images)
    n, h, w, _ = images.shape
    _, _, n_h, n_w = trunk_geometry(h, w, patch, stride)
    x = reflect_pad(images, patch, stride)
    # same conv/requant loop as the per-patch path; block 5 pools at
    # stride 1 below for per-patch pool parity
    x = int8_backbone(q, x, pool5=False)
    pooled_s1 = jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                      (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
    feats_s1 = pooled_s1.astype(jnp.float32) * q["final_scale"]
    feats = _cells_to_patch_feats(feats_s1, patch, stride, n_h, n_w)
    return _head_probs(feats, q["head"]["fc1"], q["head"]["predictions"])


def shared_trunk_probs_f32(params: dict, images: jnp.ndarray, patch: int = 96,
                           stride: int = 48, dtype=jnp.float32) -> jnp.ndarray:
    """Float shared-trunk patch probabilities from a ``VGG16Classifier``
    params tree (parity/gate variant of ``shared_trunk_probs_int8``)."""
    images = images.astype(dtype)
    n, h, w, _ = images.shape
    _, _, n_h, n_w = trunk_geometry(h, w, patch, stride)
    x = reflect_pad(images, patch, stride)
    bb = params["vgg16"]
    for block, n_convs, _f in _CFG:
        for ci in range(1, n_convs + 1):
            p = bb[f"block{block}_conv{ci}"]
            x = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=_DN) + p["bias"].astype(dtype)
            x = jnp.maximum(x, 0.0)
        if block < 5:
            x = jax.lax.reduce_window(x, -jnp.inf if dtype == jnp.float32
                                      else dtype(-np.inf), jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    pooled_s1 = jax.lax.reduce_window(x, -jnp.inf if dtype == jnp.float32
                                      else dtype(-np.inf), jax.lax.max,
                                      (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
    feats = _cells_to_patch_feats(pooled_s1.astype(jnp.float32), patch,
                                  stride, n_h, n_w)
    return _head_probs(feats, params["fc1"], params["predictions"])
