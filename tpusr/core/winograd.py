"""Winograd F(2x2, 3x3) convolution — the MAC-reduction candidate for the
VGG16 3x3 conv stacks (VERDICT r2 next-step 1b), implemented for XLA.

F(2,3) computes each 2x2 output tile from a 4x4 input tile with 16
multiplies per channel pair instead of 36 (2.25x fewer MACs):

    Y = A^T [ (G g G^T) .* (B^T d B) ] A

with the standard matrices (coefficients in {0, +-1} for B/A and
{0, +-1, +-1/2} for G), so the input transform is exact in int arithmetic
and the weight transform is done offline in f32.

Two variants:
- ``winograd_conv``      — f32/bf16: transforms + one 16-way batched GEMM.
- ``winograd_conv_int8`` — int8 MXU GEMM core with per-position requant:
  the transformed input u = B^T d B of an int8 tensor is exact in int32 and
  bounded by 4*127, so requantizing with the analytic per-position scale
  keeps the GEMM on the int8 path; per-(position, out-channel) weight
  scales fold into one f32 rescale before the output transform.

Measured verdict (PERF.md round 3): the 16-position intermediates make this
bandwidth-bound on TPU — the (16, tiles, C) GEMM operands/results are 4x
the activation tensor and the MXU loses more to the extra HBM traffic than
the 2.25x MAC cut saves at VGG channel widths. Kept in-tree as the measured
basis for that conclusion (tests assert exactness vs lax.conv).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# F(2x2, 3x3) transform matrices
_BT = np.asarray([[1, 0, -1, 0],
                  [0, 1, 1, 0],
                  [0, -1, 1, 0],
                  [0, 1, 0, -1]], np.float32)
_G = np.asarray([[1, 0, 0],
                 [0.5, 0.5, 0.5],
                 [0.5, -0.5, 0.5],
                 [0, 0, 1]], np.float32)
_AT = np.asarray([[1, 1, 1, 0],
                  [0, 1, -1, -1]], np.float32)


def transform_weights(kernel) -> jnp.ndarray:
    """(3, 3, K, N) -> (16, K, N): G g G^T per channel pair, f32."""
    g = jnp.asarray(kernel, jnp.float32)
    # (4,3)@(3,3)@(3,4) over leading dims via einsum
    t = jnp.einsum("ai,ijkn,bj->abkn", jnp.asarray(_G), g, jnp.asarray(_G))
    return t.reshape(16, *t.shape[2:])


def _tile_slices(xp: jnp.ndarray, th: int, tw: int):
    """xp (B, H+2, W+2, C) -> d[i][j] (B, th, tw, C) strided views of the
    4x4 tiles at stride 2 (tile m starts at row 2m)."""
    b, _, _, c = xp.shape
    d = []
    for i in range(4):
        row = []
        for j in range(4):
            row.append(jax.lax.slice(
                xp, (0, i, j, 0), (b, i + 2 * (th - 1) + 1,
                                   j + 2 * (tw - 1) + 1, c), (1, 2, 2, 1)))
        d.append(row)
    return d


def _input_transform(d, dtype):
    """B^T d B with {0,+-1} coefficients: u[a][b] as explicit sums."""
    bt = _BT.astype(np.int32)
    u = []
    for a in range(4):
        for b4 in range(4):
            acc = None
            for i in range(4):
                if bt[a, i] == 0:
                    continue
                inner = None
                for j in range(4):
                    if bt[b4, j] == 0:
                        continue
                    term = d[i][j].astype(dtype)
                    term = term if bt[b4, j] > 0 else -term
                    inner = term if inner is None else inner + term
                if inner is None:
                    continue
                inner = inner if bt[a, i] > 0 else -inner
                acc = inner if acc is None else acc + inner
            u.append(acc)
    return u  # list of 16 (B, th, tw, C)


def _output_assemble(f, b, th, tw, n):
    """A^T F A: (16, B*th*tw, N) f32 -> (B, 2*th, 2*tw, N)."""
    at = _AT
    fm = f.reshape(4, 4, b, th, tw, n)
    # y[e,f] = sum_{a,b} AT[e,a] AT[f,b] fm[a,b]
    y = jnp.einsum("ea,abxtwn,fb->xtwefn", jnp.asarray(at), fm,
                   jnp.asarray(at))
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (B, th, e, tw, f, N)
    return y.reshape(b, 2 * th, 2 * tw, n)


def winograd_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                  gemm_dtype=jnp.float32) -> jnp.ndarray:
    """SAME 3x3 conv via F(2x2,3x3); x (B, H, W, K) with even H, W.
    Bit-comparable to lax.conv at f32 (tests: atol 1e-4)."""
    b, h, w, k = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"winograd F(2,3): H and W must be even (2x2 output tiles), "
            f"got {(h, w)}")
    n = kernel.shape[-1]
    th, tw = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    d = _tile_slices(xp, th, tw)
    u = _input_transform(d, gemm_dtype)
    U = jnp.stack([t.reshape(b * th * tw, k) for t in u])      # (16, M, K)
    W = transform_weights(kernel).astype(gemm_dtype)           # (16, K, N)
    Y = jax.lax.dot_general(
        U, W, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # (16, M, N)
    return _output_assemble(Y, b, th, tw, n)


def quantize_winograd_weights(kernel, s_u: np.ndarray):
    """(3,3,K,N) f32 -> (Wq (16,K,N) int8, rescale (16,1,N) f32) where
    rescale folds the per-position input scale and per-(position, N) weight
    scale for the f32 dequant after the int8 GEMM."""
    t = np.asarray(transform_weights(kernel))                  # (16, K, N)
    w_scale = np.maximum(np.abs(t).max(axis=1, keepdims=True) / 127.0, 1e-12)
    wq = np.clip(np.round(t / w_scale), -127, 127).astype(np.int8)
    rescale = (w_scale * s_u.reshape(16, 1, 1)).astype(np.float32)
    return jnp.asarray(wq), jnp.asarray(rescale)


def winograd_conv_int8(x_int8: jnp.ndarray, s_x: float, wq: jnp.ndarray,
                       rescale: jnp.ndarray) -> jnp.ndarray:
    """int8 Winograd: x int8 (B, H, W, K) with activation scale s_x;
    wq/rescale from ``quantize_winograd_weights`` with
    s_u = s_x * U_BOUND (the analytic |B^T d B| <= 4*127 bound gives
    U_BOUND = 4 for every position — exact requant by a power-of-two shift).
    Returns f32 conv output (B, H, W, N)."""
    b, h, w, k = x_int8.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"winograd F(2,3): H and W must be even (2x2 output tiles), "
            f"got {(h, w)}")
    n = wq.shape[-1]
    th, tw = h // 2, w // 2
    xp = jnp.pad(x_int8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    d = _tile_slices(xp, th, tw)
    u = _input_transform(d, jnp.int32)                         # exact int32
    uq = [_requant_u4(t) for t in u]
    U = jnp.stack([t.reshape(b * th * tw, k) for t in uq])
    Y = jax.lax.dot_general(
        U, wq, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                      # (16, M, N)
    F = Y.astype(jnp.float32) * rescale
    return _output_assemble(F, b, th, tw, n)


def _requant_u4(t: jnp.ndarray) -> jnp.ndarray:
    """int32 u (|u| <= 508) -> int8 u/4, round-half-away-from-zero on the
    magnitude. A shift on the signed value would floor negatives one grid
    step too low (e.g. -4 -> -2 instead of -1) — a systematic negative bias
    (tests/test_winograd.py::test_requant_rounding)."""
    return jnp.clip(jnp.sign(t) * ((jnp.abs(t) + 2) >> 2),
                    -127, 127).astype(jnp.int8)


def int8_u_scales(s_x: float) -> np.ndarray:
    """Per-position u scales for ``quantize_winograd_weights``: the /4
    requant means the effective u grid is s_x * 4."""
    return np.full((16,), s_x * 4.0, np.float32)
