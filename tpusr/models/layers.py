"""Shared flax building blocks: pixel shuffle, spectral normalization,
self-attention.

References:
- pixel_shuffle == tf.nn.depth_to_space DCR order (EDSR_model.py:81,
  ESRGAN_model.py:298).
- SNConv/SNDense == keras SpectralNormalization(Conv2D/Dense)
  (tensorflow_addons), one power iteration per training step with a persistent
  u vector (ESRGAN_model.py:358-373). Functionally: u lives in the 'spectral'
  variable collection, mutable only inside training steps.
  Interop note: TFA/keras normalize DESTRUCTIVELY during training forwards
  (kernel <- kernel/sigma assigned in place; inference applies the stored
  kernel raw). The functional formulation here keeps the kernel pristine and
  divides on the fly — identical math to the reference's training-time
  forward given the same stored (kernel, u), which is what .h5 resume parity
  requires (see tests/test_keras_import_esrgan.py); it is the standard
  non-destructive SN-GAN parametrization rather than TFA's in-place quirk.
- SelfAttention == ESRGAN_model.py:30-79 (SAGAN-style, full HWxHW attention,
  straight residual add, no gamma).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import flax.linen as nn

_HI = jax.lax.Precision.HIGHEST


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """tf.nn.depth_to_space parity (DCR): (N,H,W,C*r^2) -> (N,H*r,W*r,C)."""
    n, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(n, h, w, r, r, oc)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * r, w * r, oc)


def _l2_normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v) + eps)


def _spectral_sigma(module: nn.Module, w_mat: jnp.ndarray, update_stats: bool):
    """One power-iteration estimate of ||W||_2 with persistent u (1, out)."""
    u = module.variable(
        "spectral", "u",
        lambda rng, shape: jax.random.normal(rng, shape),
        module.make_rng("params") if module.is_initializing() else jax.random.PRNGKey(0),
        (1, w_mat.shape[-1]),
    )
    # Keras/TFA parity: gradients flow through w_mat only — the power-
    # iteration vectors are stop_gradient'ed before sigma (keras
    # SpectralNormalization.normalized_weights does the same), otherwise
    # D-gradients deviate from the reference every step.
    v_val = jax.lax.stop_gradient(_l2_normalize(u.value @ w_mat.T))
    u_new = jax.lax.stop_gradient(_l2_normalize(v_val @ w_mat))
    sigma = (v_val @ w_mat @ u_new.T)[0, 0]
    if update_stats and not module.is_initializing():
        u.value = u_new
    return sigma


class SNConv(nn.Module):
    """Spectrally-normalized Conv2D (keras SpectralNormalization parity)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        sigma = _spectral_sigma(self, kernel.reshape(-1, self.features), update_stats)
        w_bar = (kernel / sigma).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w_bar, self.strides, self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI)
        return y + bias.astype(x.dtype)


class SNDense(nn.Module):
    """Spectrally-normalized Dense."""

    features: int

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        sigma = _spectral_sigma(self, kernel, update_stats)
        return x @ ((kernel / sigma).astype(x.dtype)) + bias.astype(x.dtype)


def _streaming_attention(gg, ff, hf, block_size: int):
    """Exact softmax attention with O(HW * block) memory: scan over key
    blocks with a running (max, denominator, numerator) — the standard
    online-softmax / flash-attention recurrence, written for XLA. HW must be
    divisible by block_size (callers pad tokens; padded keys are excluded by
    construction because they are never included in the scanned blocks)."""
    b, n, dk = gg.shape
    dv = hf.shape[-1]
    nb = n // block_size
    ff_b = ff.reshape(b, nb, block_size, dk)
    hf_b = hf.reshape(b, nb, block_size, dv)

    def step(carry, blk):
        m, l, acc = carry
        f_i, h_i = blk
        s = jnp.einsum("bic,bjc->bij", gg, f_i, precision=_HI)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * scale + jnp.sum(p, axis=-1)
        acc_new = acc * scale[..., None] + jnp.einsum(
            "bij,bjc->bic", p, h_i, precision=_HI)
        return (m_new, l_new, acc_new), None

    init = (jnp.full((b, n), -jnp.inf, gg.dtype),
            jnp.zeros((b, n), gg.dtype),
            jnp.zeros((b, n, dv), gg.dtype))
    (m, l, acc), _ = jax.lax.scan(
        step, init, (jnp.moveaxis(ff_b, 1, 0), jnp.moveaxis(hf_b, 1, 0)))
    return acc / l[..., None]


class SelfAttention(nn.Module):
    """SAGAN-style self-attention over HW tokens (ESRGAN_model.py:30-79).

    f, g project to C//8, h to C//2, output projection v back to C; the
    attention map is softmax(g @ f^T) over all HW positions; the residual is a
    straight add (no learned gamma, matching the reference).

    ``block_size``: when set, the (HW, HW) attention matrix is never
    materialized — keys/values stream through an exact online-softmax scan
    in blocks of ``block_size`` tokens (SURVEY §5's long-context analog:
    activation memory becomes O(HW * block) instead of O(HW^2), enabling
    full-image ESRGAN SR at sizes where dense attention OOMs). Same
    parameters, same math; outputs match the dense path to float
    round-off. ``block_size`` must divide the token count HW.

    ``attention_fn``: full override of the attention inner computation —
    called as ``attention_fn(gg, ff, hf) -> o`` with (B, HW, d) token
    tensors (queries=g-proj, keys=f-proj, values=h-proj). Used by
    ``tpusr.dist.spatial`` to run ring attention with the token axis
    sharded over a device mesh (SURVEY §5 sequence-parallel analog).
    Takes precedence over ``block_size``.
    """

    channels: int
    block_size: int | None = None
    attention_fn: "typing.Callable | None" = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        f = nn.Conv(self.channels // 8, (1, 1), name="f")(x)
        g = nn.Conv(self.channels // 8, (1, 1), name="g")(x)
        h = nn.Conv(self.channels // 2, (1, 1), name="h")(x)

        ff = f.reshape(b, hh * ww, -1)
        gg = g.reshape(b, hh * ww, -1)
        hf = h.reshape(b, hh * ww, -1)

        if self.attention_fn is not None:
            o = self.attention_fn(gg, ff, hf)
        elif self.block_size is None or hh * ww <= self.block_size:
            s = jnp.einsum("bic,bjc->bij", gg, ff, precision=_HI)
            beta = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bij,bjc->bic", beta, hf, precision=_HI)
        else:
            n = hh * ww
            if n % self.block_size:
                raise ValueError(
                    f"block_size {self.block_size} must divide HW={n} "
                    f"(choose a divisor of the token count)")
            o = _streaming_attention(gg, ff, hf, self.block_size)
        o = o.reshape(b, hh, ww, self.channels // 2)
        o = nn.Conv(self.channels, (1, 1), name="v")(o)
        return x + o
