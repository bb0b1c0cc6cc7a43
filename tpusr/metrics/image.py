"""Image quality metrics — jittable, with tf.image / reference parity.

The reference's training metrics are thin wrappers over ``tf.image.psnr/ssim``
(``SRModels/metrics.py:3-7``); its profiling metrics live in
``classic_super_resolution_algorithms/profiling_methods.py:45-164``. Everything
here is pure jnp so the whole metric block fuses into the surrounding graph.

SSIM matches tf.image.ssim defaults: 11x11 Gaussian window sigma=1.5,
k1=0.01, k2=0.03, VALID padding, mean over space then channels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_EPS = 1e-9
_HI = jax.lax.Precision.HIGHEST


# ------------------------------------------------------------------ PSNR/SSIM
def psnr(y_true: jnp.ndarray, y_pred: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over the last three dims (tf.image.psnr parity)."""
    err = (y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)) ** 2
    mse = jnp.mean(err, axis=(-3, -2, -1))
    return 10.0 * (2.0 * jnp.log10(max_val) - jnp.log10(mse))


def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g


def _filter2_valid(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable VALID Gaussian filter over (N, H, W, C) per channel."""
    n, h, w, c = x.shape
    k = win.shape[0]
    xr = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h, w, 1)
    kv = jnp.asarray(win, x.dtype).reshape(k, 1, 1, 1)
    kh = jnp.asarray(win, x.dtype).reshape(1, k, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(xr, kv, (1, 1), "VALID",
                                     dimension_numbers=dn, precision=_HI)
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, precision=_HI)
    oh, ow = y.shape[1], y.shape[2]
    return jnp.transpose(y.reshape(n, c, oh, ow), (0, 2, 3, 1))


def ssim(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-image SSIM (tf.image.ssim parity). Accepts (..., H, W, C)."""
    x = y_true.astype(jnp.float32)
    y = y_pred.astype(jnp.float32)
    squeeze = False
    if x.ndim == 3:
        x, y = x[None], y[None]
        squeeze = True
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    y = y.reshape((-1,) + y.shape[-3:])

    win = _fspecial_gauss(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = _filter2_valid(x, win)
    mu_y = _filter2_valid(y, win)
    mu_xx = _filter2_valid(x * x, win)
    mu_yy = _filter2_valid(y * y, win)
    mu_xy = _filter2_valid(x * y, win)

    # tf.image.ssim: num/den formulation with uncentered second moments.
    lum = (2.0 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)
    cs = (2.0 * (mu_xy - mu_x * mu_y) + c2) / ((mu_xx - mu_x**2) + (mu_yy - mu_y**2) + c2)
    val = jnp.mean(lum * cs, axis=(1, 2, 3))

    if squeeze:
        return val[0]  # unbatched (H, W, C) input -> scalar
    return val.reshape(lead)  # lead is non-empty whenever squeeze is False


def ssim_skimage(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    channel_axis: int | None = None,
) -> jnp.ndarray:
    """skimage.metrics.structural_similarity parity (defaults: 7x7 uniform
    window, sample covariance). The classic-comparison harness
    (``super_resolucion_clasica.ipynb cell 7``) scores with this variant, not
    tf.image's Gaussian one."""
    x = y_true.astype(jnp.float32)
    y = y_pred.astype(jnp.float32)
    if channel_axis is not None:
        vals = [ssim_skimage(jnp.take(x, c, channel_axis), jnp.take(y, c, channel_axis),
                             data_range, win_size) for c in range(x.shape[channel_axis])]
        return jnp.mean(jnp.stack(vals))

    def ufilt(a):
        win = np.full((win_size,), 1.0 / win_size)
        return _filter2_valid(a[None, :, :, None], win)[0, :, :, 0]

    np_ = win_size ** 2
    cov_norm = np_ / (np_ - 1.0)  # sample covariance
    ux, uy = ufilt(x), ufilt(y)
    uxx, uyy, uxy = ufilt(x * x), ufilt(y * y), ufilt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    # skimage crops pad=(win-1)//2 from each side of the VALID map's *input*;
    # the VALID output is already cropped by pad on each side, so mean directly.
    return jnp.mean(s)


# ---------------------------------------------------------------- error stats
def mae(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (profiling_methods.py:45-47)."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Root mean squared error with the reference's epsilon (profiling_methods.py:49-53)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(d * d) + _EPS)


# ----------------------------------------------------------------- edge stats
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor RGB2GRAY weights (0.299, 0.587, 0.114)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.tensordot(img, w, axes=[[-1], [0]])


def _ensure_gray01(img: jnp.ndarray) -> jnp.ndarray:
    """Mirror profiling_methods._ensure_gray_f32: gray float32 scaled to [0,1]."""
    if img.ndim == 3:
        img = rgb_to_gray(img)
    img = img.astype(jnp.float32)
    return jnp.where(img.max() > 1.5, img / 255.0, img)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T


def _conv2_reflect101(img: jnp.ndarray, kern: np.ndarray) -> jnp.ndarray:
    """3x3 correlation with cv2's default BORDER_REFLECT_101 (= np 'reflect')."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="reflect")
    x = p[None, :, :, None]
    k = jnp.asarray(kern)[:, :, None, None]
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     precision=_HI)
    return y[0, :, :, 0]


def sobel_mag(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude (profiling_methods.py:70-77), ksize=3."""
    g = _ensure_gray01(img)
    gx = _conv2_reflect101(g, _SOBEL_X)
    gy = _conv2_reflect101(g, _SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy)


def gradient_mse(hr: jnp.ndarray, sr: jnp.ndarray) -> jnp.ndarray:
    """MSE between HR/SR Sobel magnitudes (profiling_methods.py:79-85)."""
    return jnp.mean((sobel_mag(hr) - sobel_mag(sr)) ** 2)


def epi(hr: jnp.ndarray, sr: jnp.ndarray) -> jnp.ndarray:
    """Edge-preservation index: SR/HR gradient-energy ratio (profiling_methods.py:87-93)."""
    return (sobel_mag(sr).sum() + _EPS) / (sobel_mag(hr).sum() + _EPS)


# ------------------------------------------------------------ frequency stats
def hf_energy_ratio(hr: jnp.ndarray, sr: jnp.ndarray, radius_frac: float = 0.6) -> jnp.ndarray:
    """High-frequency spectral energy ratio SR/HR on grayscale images
    (profiling_methods.py:98-114). Inputs must be 2-D."""
    hr_f = hr.astype(jnp.float32)
    sr_f = sr.astype(jnp.float32)
    f_hr = jnp.fft.fftshift(jnp.fft.fft2(hr_f))
    f_sr = jnp.fft.fftshift(jnp.fft.fft2(sr_f))
    h, w = hr_f.shape
    cy, cx = h // 2, w // 2
    yy = jnp.arange(h)[:, None] - cy
    xx = jnp.arange(w)[None, :] - cx
    r = jnp.sqrt(yy.astype(jnp.float32) ** 2 + xx.astype(jnp.float32) ** 2)
    mask = r > (radius_frac * (r.max() + _EPS))
    num = jnp.sum(jnp.abs(f_sr) * mask) + _EPS
    den = jnp.sum(jnp.abs(f_hr) * mask) + _EPS
    return num / den


def _hist_density(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """np.histogram(range=(0,255), density=True) parity under jit."""
    edges = jnp.linspace(0.0, 255.0, bins + 1)
    # np.histogram: right-open bins except the last which is closed.
    idx = jnp.clip(jnp.searchsorted(edges, x.ravel(), side="right") - 1, 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    # density: counts / (n * bin_width); out-of-range values never occur here
    width = 255.0 / bins
    return counts / (counts.sum() * width)


def _to_255(img: jnp.ndarray) -> jnp.ndarray:
    """Mirror the reference's dtype handling: floats are [0,1]*255, ints used as-is."""
    if jnp.issubdtype(img.dtype, jnp.floating):
        return jnp.clip(img, 0.0, 1.0) * 255.0
    return img.astype(jnp.float32)


def kl_divergence(p_img: jnp.ndarray, q_img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """KL divergence of grayscale histograms (profiling_methods.py:116-137)."""
    p = _hist_density(_to_255(p_img), bins) + 1e-12
    q = _hist_density(_to_255(q_img), bins) + 1e-12
    return jnp.sum(p * jnp.log(p / q))


def kl_divergence_color(p_rgb: jnp.ndarray, q_rgb: jnp.ndarray, bins: int = 64) -> jnp.ndarray:
    """Mean per-channel KL divergence for RGB (profiling_methods.py:139-164)."""
    p = _to_255(p_rgb)
    q = _to_255(q_rgb)
    total = jnp.float32(0.0)
    for c in range(p.shape[-1]):
        ph = _hist_density(p[..., c], bins) + 1e-12
        qh = _hist_density(q[..., c], bins) + 1e-12
        total = total + jnp.sum(ph * jnp.log(ph / qh))
    return total / p.shape[-1]
