"""Reflect padding for sliding-window patch coverage.

Reference semantics: ``SRModels/loading_methods.py:6-26`` (and its four inline
re-implementations, e.g. ``SRCNN_model.py:127-147``): pad the bottom/right of an
image so a (patch, stride) sliding window fully covers it, using mirror
(reflect-101) padding.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_amounts(h: int, w: int, patch: int, stride: int) -> tuple[int, int]:
    """Bottom/right padding so patches of `patch` at `stride` cover (h, w).

    Matches loading_methods.py:12-17 exactly:
        pad = (patch - (dim % stride)) % stride   if dim % stride else 0
        pad = max(pad, patch - stride)
    """
    pad_h = (patch - (h % stride)) % stride if h % stride != 0 else 0
    pad_w = (patch - (w % stride)) % stride if w % stride != 0 else 0
    pad_h = max(pad_h, patch - stride)
    pad_w = max(pad_w, patch - stride)
    return pad_h, pad_w


def reflect_pad(image: jnp.ndarray, patch: int, stride: int) -> jnp.ndarray:
    """Reflect-pad bottom/right of (..., H, W, C) so the window fully covers it.

    Uses mode='reflect' (reflect-101, edge pixel not repeated) — identical to
    ``np.pad(..., mode='reflect')`` used by the reference.
    """
    if image.ndim < 3:
        raise ValueError("reflect_pad expects (..., H, W, C)")
    h, w = image.shape[-3], image.shape[-2]
    pad_h, pad_w = pad_amounts(h, w, patch, stride)
    cfg = [(0, 0)] * (image.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
    return jnp.pad(image, cfg, mode="reflect")
