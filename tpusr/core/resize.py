"""OpenCV-parity separable resampling as MXU matmuls.

The reference calls ``cv2.resize`` with INTER_LINEAR / INTER_CUBIC / INTER_AREA /
INTER_LANCZOS4 throughout (``classic_algorithms.py:7-21``, ``loading_methods.py:147``,
``SRCNN_model.py:191``). On TPU the natural formulation of a separable resampler is
two dense matmuls: ``out = Wv @ img @ Wh.T`` where the (out, in) weight matrices
carry exactly OpenCV's filter taps. This keeps the FLOPs on the MXU, lets XLA fuse
the surrounding elementwise work, and is bit-comparable to cv2's float path
(cv2 uses fixed-point only for uint8 inputs).

Coordinate convention (cv2): src = (dst + 0.5) * (in/out) - 0.5, taps clamped to
the image (border replicate), cubic a = -0.75, Lanczos4 = 8 taps normalized.
INTER_AREA: fractional box-overlap weights when shrinking; cv2's special
linear-like mapping when enlarging.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["resize", "resize_weights", "METHODS"]

METHODS = ("bilinear", "bicubic", "area", "lanczos4")


def _accumulate(out_size: int, in_size: int, dst_idx, tap_idx, tap_w) -> np.ndarray:
    """Scatter taps (clamped to the image) into a dense (out, in) weight matrix."""
    W = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(W, (dst_idx, np.clip(tap_idx, 0, in_size - 1)), tap_w)
    return W


def _src_coords(out_size: int, in_size: int):
    scale = in_size / out_size
    dst = np.arange(out_size)
    src = (dst + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    t = src - x0
    return dst, x0, t


def _bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    dst, x0, t = _src_coords(out_size, in_size)
    W = _accumulate(out_size, in_size, dst, x0, 1.0 - t)
    W += _accumulate(out_size, in_size, dst, x0 + 1, t)
    return W


def _cubic_kernel(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    d = np.abs(d)
    inner = ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
    outer = (((d - 5.0) * d + 8.0) * d - 4.0) * a
    return np.where(d <= 1.0, inner, np.where(d < 2.0, outer, 0.0))


def _bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    dst, x0, t = _src_coords(out_size, in_size)
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in (-1, 0, 1, 2):
        W += _accumulate(out_size, in_size, dst, x0 + o, _cubic_kernel(t - o))
    return W


def _lanczos4_kernel(d: np.ndarray) -> np.ndarray:
    d = np.asarray(d, dtype=np.float64)
    eps = np.abs(d) < 1e-12
    x = np.where(eps, 1.0, d)
    k = (np.sin(np.pi * x) * np.sin(np.pi * x / 4.0)) / (np.pi * np.pi * x * x / 4.0)
    return np.where(eps, 1.0, np.where(np.abs(d) < 4.0, k, 0.0))


def _lanczos4_weights(in_size: int, out_size: int) -> np.ndarray:
    dst, x0, t = _src_coords(out_size, in_size)
    offs = np.arange(-3, 5)
    raw = np.stack([_lanczos4_kernel(t - o) for o in offs], axis=0)  # (8, out)
    raw /= raw.sum(axis=0, keepdims=True)  # cv2 normalizes the 8 taps
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for k, o in enumerate(offs):
        W += _accumulate(out_size, in_size, dst, x0 + o, raw[k])
    return W


def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if scale >= 1.0:
        # Shrinking: fractional box-overlap weights (cv2 resizeArea).
        for o in range(out_size):
            start, end = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(start)), int(np.ceil(end))
            for i in range(i0, min(i1, in_size)):
                overlap = min(i + 1.0, end) - max(float(i), start)
                if overlap > 0:
                    W[o, i] = overlap / scale
        # Guard for numerical edge cases at the right border.
        rs = W.sum(axis=1, keepdims=True)
        W = W / np.where(rs == 0, 1.0, rs)
    else:
        # Enlarging: cv2 maps INTER_AREA to a linear-like scheme:
        #   sx = floor(dx*scale); fx = (dx+1) - (sx+1)/scale^{-1}; fx<=0 -> 0
        inv_scale = out_size / in_size
        dst = np.arange(out_size)
        sx = np.floor(dst * scale).astype(np.int64)
        fx = (dst + 1) - (sx + 1) * inv_scale
        fx = np.where(fx <= 0, 0.0, fx - np.floor(fx))
        W = _accumulate(out_size, in_size, dst, sx, 1.0 - fx)
        W += _accumulate(out_size, in_size, dst, sx + 1, fx)
    return W


_BUILDERS = {
    "bilinear": _bilinear_weights,
    "bicubic": _bicubic_weights,
    "area": _area_weights,
    "lanczos4": _lanczos4_weights,
}


@functools.lru_cache(maxsize=512)
def _resize_weights_np(in_size: int, out_size: int, method: str) -> np.ndarray:
    if method not in _BUILDERS:
        raise ValueError(f"unknown resize method {method!r}; expected one of {METHODS}")
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    return _BUILDERS[method](in_size, out_size).astype(np.float32)


def resize_weights(in_size: int, out_size: int, method: str) -> np.ndarray:
    """Dense (out_size, in_size) 1-D resampling matrix with cv2-parity taps."""
    return _resize_weights_np(int(in_size), int(out_size), method)


def resize(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic") -> jnp.ndarray:
    """Resize (..., H, W, C) or (H, W) images with OpenCV-parity filters.

    Two MXU matmuls (vertical then horizontal pass). Shapes are static under
    jit, so the weight matrices are trace-time constants.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if x.ndim == 2:
        in_h, in_w = x.shape
    else:
        in_h, in_w = x.shape[-3], x.shape[-2]

    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    wv = jnp.asarray(resize_weights(in_h, out_h, method), dtype)
    wh = jnp.asarray(resize_weights(in_w, out_w, method), dtype)
    xf = x.astype(dtype)

    # HIGHEST keeps the MXU in f32 accumulation — required for cv2 parity.
    hi = jax.lax.Precision.HIGHEST
    if x.ndim == 2:
        y = jnp.einsum("oh,hw->ow", wv, xf, precision=hi)
        return jnp.einsum("pw,ow->op", wh, y, precision=hi)
    y = jnp.einsum("oh,...hwc->...owc", wv, xf, precision=hi)
    return jnp.einsum("pw,...owc->...opc", wh, y, precision=hi)
