"""Degradation model: HR -> (LR, interp_name), reference ``data/common_methods.py:51-100``.

The reference's cv2/np.random pipeline becomes a jit-compatible function of an
explicit PRNG key (deterministic, vmappable for on-device synthetic-pair
generation): Gaussian blur (p=.7, k in {3,5,7}, sigma in [0.8,2.0]), horizontal
motion blur (p=.3, k in {5,7,9}), x`scale` downscale with a random
interpolation from {bilinear,bicubic,area,lanczos4}, Gaussian noise
(p=.7, sigma in [2,10] on the 0..255 scale). The JPEG re-encode stage (p=.7,
q in [20,60]) is inherently a host codec; ``jpeg_roundtrip`` applies it via cv2
when requested (matching the reference), and is skipped on-device.

Because the blur-kernel size and interpolation choice are data-dependent, the
jittable core evaluates all branch variants and selects — branchless, XLA-friendly.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.core.resize import resize

_INTERP_NAMES = ("INTER_LINEAR", "INTER_CUBIC", "INTER_AREA", "INTER_LANCZOS4")
_INTERP_METHODS = ("bilinear", "bicubic", "area", "lanczos4")
_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class DegradeConfig:
    scale_factor: float = 0.5
    p_gauss_blur: float = 0.7
    p_motion_blur: float = 0.3
    p_noise: float = 0.7
    p_jpeg: float = 0.7
    gauss_ksizes: tuple[int, ...] = (3, 5, 7)
    motion_ksizes: tuple[int, ...] = (5, 7, 9)
    sigma_range: tuple[float, float] = (0.8, 2.0)
    noise_range: tuple[float, float] = (2.0, 10.0)
    jpeg_q_range: tuple[int, int] = (20, 60)


def _gauss_kernel1d(ksize: int, sigma) -> jnp.ndarray:
    """cv2.getGaussianKernel parity for the sigma>0 path."""
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_blur(img, kv, kh):
    """Separable blur with reflect-101 borders (cv2 default)."""
    ph = kv.shape[0] // 2
    pw = kh.shape[0] // 2
    x = jnp.pad(img, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")
    x = x[None]
    dn = ("NHWC", "HWIO", "NHWC")
    c = img.shape[-1]
    kvf = kv.reshape(-1, 1, 1, 1)
    khf = kh.reshape(1, -1, 1, 1)
    # depthwise: move channels into batch
    n, hh, ww, _ = x.shape
    xr = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, hh, ww, 1)
    y = jax.lax.conv_general_dilated(xr, kvf, (1, 1), "VALID",
                                     dimension_numbers=dn, precision=_HI)
    y = jax.lax.conv_general_dilated(y, khf, (1, 1), "VALID",
                                     dimension_numbers=dn, precision=_HI)
    oh, ow = y.shape[1], y.shape[2]
    return jnp.transpose(y.reshape(n, c, oh, ow), (0, 2, 3, 1))[0]


def degrade_image_core(hr01: jnp.ndarray, key: jax.Array,
                       cfg: DegradeConfig = DegradeConfig()):
    """Jittable degradation of an HR image in [0,1] (JPEG stage excluded).

    Returns (lr01, interp_idx) where interp_idx indexes _INTERP_NAMES.
    Data-dependent choices (kernel size, interpolation) are computed
    branchlessly: every variant is evaluated and the sampled one selected —
    the XLA-friendly formulation of the reference's python `if` chain.
    """
    keys = jax.random.split(key, 8)
    x = hr01.astype(jnp.float32) * 255.0

    # Gaussian blur (p=.7, ksize in {3,5,7}, sigma in [0.8, 2.0])
    do_blur = jax.random.uniform(keys[0]) < cfg.p_gauss_blur
    k_idx = jax.random.randint(keys[1], (), 0, len(cfg.gauss_ksizes))
    sigma = jax.random.uniform(keys[2], minval=cfg.sigma_range[0],
                               maxval=cfg.sigma_range[1])
    blurred = [_sep_blur(x, _gauss_kernel1d(k, sigma), _gauss_kernel1d(k, sigma))
               for k in cfg.gauss_ksizes]
    x_blur = jnp.select([k_idx == i for i in range(len(blurred))], blurred)
    x = jnp.where(do_blur, x_blur, x)

    # Motion blur (p=.3, horizontal box of size in {5,7,9})
    do_motion = jax.random.uniform(keys[3]) < cfg.p_motion_blur
    m_idx = jax.random.randint(keys[4], (), 0, len(cfg.motion_ksizes))
    motioned = [_sep_blur(x, jnp.asarray([1.0]), jnp.full((k,), 1.0 / k))
                for k in cfg.motion_ksizes]
    x_motion = jnp.select([m_idx == i for i in range(len(motioned))], motioned)
    x = jnp.where(do_motion, x_motion, x)

    # Downscale with a random interpolation method
    h, w = hr01.shape[:2]
    out_hw = (int(h * cfg.scale_factor), int(w * cfg.scale_factor))
    interp_idx = jax.random.randint(keys[5], (), 0, len(_INTERP_METHODS))
    resized = [resize(x, out_hw, m) for m in _INTERP_METHODS]
    lr = jnp.select([interp_idx == i for i in range(len(resized))], resized)

    # Gaussian noise (p=.7, sigma in [2, 10] on 0..255)
    do_noise = jax.random.uniform(keys[6]) < cfg.p_noise
    noise_std = jax.random.uniform(keys[7], minval=cfg.noise_range[0],
                                   maxval=cfg.noise_range[1])
    noise = jax.random.normal(jax.random.fold_in(key, 99), lr.shape) * noise_std
    lr = jnp.where(do_noise, jnp.clip(lr + noise, 0.0, 255.0), lr)

    return jnp.clip(lr, 0.0, 255.0) / 255.0, interp_idx


# module-level wrapper: a fresh jax.jit per degrade_image call would miss
# the C++ fast-path dispatch cache on every frame of a video extraction
_degrade_core_jit = jax.jit(degrade_image_core, static_argnums=2)


def jpeg_roundtrip(lr01: np.ndarray, quality: int) -> np.ndarray:
    """Host-side JPEG re-encode (common_methods.py:94-99)."""
    import cv2

    u8 = np.clip(np.asarray(lr01) * 255.0, 0, 255).round().astype(np.uint8)
    ok, enc = cv2.imencode(".jpeg", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
                           [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def degrade_image(hr01, key=None, cfg: DegradeConfig = DegradeConfig(),
                  apply_jpeg: bool = True, seed: int | None = None):
    """Full degradation (common_methods.py:51-100): jittable core + optional
    host JPEG stage. Returns (lr01, interp_name)."""
    if key is None:
        key = jax.random.PRNGKey(0 if seed is None else seed)
    lr01, interp_idx = _degrade_core_jit(
        jnp.asarray(np.asarray(hr01, np.float32)), key, cfg)
    lr01 = np.asarray(lr01)
    interp_name = _INTERP_NAMES[int(interp_idx)]
    if apply_jpeg:
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        if float(jax.random.uniform(k1)) < cfg.p_jpeg:
            q = int(jax.random.randint(k2, (), cfg.jpeg_q_range[0],
                                       cfg.jpeg_q_range[1]))
            lr01 = jpeg_roundtrip(lr01, q)
    return lr01, interp_name
