"""The eight classic SR algorithms as jittable TPU functions.

Reference: ``classic_super_resolution_algorithms/classic_algorithms.py``.
The cv2/numpy/skimage calls become XLA ops: resampling is the MXU matmul
kernel (tpusr.core.resize), IBP is a ``fori_loop`` over it, frequency
extrapolation is XLA's native FFT, NLM is a scan over search offsets with
box-filtered patch distances (the skimage ``fast_mode`` algorithm), and the
wavelet sigma estimator is a db2 HH-subband MAD.

All functions take/return float32. Grayscale algorithms operate in [0, 255]
like the reference's uint8 path; callers convert dtypes at the boundary.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from tpusr.core.resize import resize

_HI = jax.lax.Precision.HIGHEST


# ------------------------------------------------- interpolation family (1-4)
def interpolate_bilinear(lr_img, out_hw):
    """cv2.INTER_LINEAR upscale (classic_algorithms.py:7-9)."""
    return resize(lr_img, out_hw, "bilinear")


def interpolate_bicubic(lr_img, out_hw):
    """cv2.INTER_CUBIC upscale (classic_algorithms.py:11-13)."""
    return resize(lr_img, out_hw, "bicubic")


def interpolate_area(lr_img, out_hw):
    """cv2.INTER_AREA upscale (classic_algorithms.py:15-17)."""
    return resize(lr_img, out_hw, "area")


def interpolate_lanczos(lr_img, out_hw):
    """cv2.INTER_LANCZOS4 upscale (classic_algorithms.py:19-21)."""
    return resize(lr_img, out_hw, "lanczos4")


# --------------------------------------------------- iterative back-projection
def back_projection(hr_image, lr_image, iterations: int = 10):
    """Iterative back-projection on grayscale [0,255] (classic_algorithms.py:23-42).

    Each iteration: bilinear-downscale the HR estimate to LR size, take the
    residual against the observed LR, bilinear-upscale it back, and add.
    A single ``fori_loop`` over the two resampling matmuls — fully on-device.
    """
    hr_hw = hr_image.shape[:2]
    lr_hw = lr_image.shape[:2]
    lr = lr_image.astype(jnp.float32)

    def body(_, hr):
        down = resize(hr, lr_hw, "bilinear")
        diff_up = resize(lr - down, hr_hw, "bilinear")
        return hr + diff_up

    hr = jax.lax.fori_loop(0, iterations, body, hr_image.astype(jnp.float32))
    return jnp.clip(hr, 0.0, 255.0)


# ------------------------------------------------------------ non-local means
# db2 decomposition high-pass filter (Daubechies-2), pywt convention.
_DB2_HI = np.array(
    [-0.48296291314469025, 0.836516303737469, -0.22414386804185735, -0.12940952255092145],
    dtype=np.float64,
)[::-1].copy()  # pywt convolves with the reversed bank


def _dwt_rows_hi(x: jnp.ndarray) -> jnp.ndarray:
    """One-level 1-D high-pass DWT along the last axis, pywt 'symmetric' mode."""
    L = _DB2_HI.shape[0]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)], mode="symmetric")
    k = jnp.asarray(_DB2_HI, x.dtype)
    # full correlation then downsample odd indices (pywt phase)
    y = jax.lax.conv_general_dilated(
        x[:, None, :], k[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=_HI,
    )[:, 0, :]
    return y[:, 1::2]


def _dwt2_hh(img: jnp.ndarray) -> jnp.ndarray:
    """HH (diagonal detail) subband of a single-level db2 DWT."""
    h = _dwt_rows_hi(img)           # high-pass along columns axis (axis=1)
    hh = _dwt_rows_hi(h.T).T        # then along rows
    return hh


def estimate_sigma(img01: jnp.ndarray) -> jnp.ndarray:
    """Wavelet-domain noise-sigma estimator (skimage.restoration.estimate_sigma):
    sigma = median(|HH|) / norm.ppf(0.75), zeros excluded."""
    hh = _dwt2_hh(img01.astype(jnp.float32))
    a = jnp.abs(hh).ravel()
    nz = a > 0
    # median over non-zeros under jit: sort with zeros pushed to +inf, take middle of count
    n = jnp.sum(nz)
    sorted_a = jnp.sort(jnp.where(nz, a, jnp.inf))
    lo = jnp.clip((n - 1) // 2, 0, a.size - 1)
    hi_i = jnp.clip(n // 2, 0, a.size - 1)
    med = 0.5 * (sorted_a[lo] + sorted_a[hi_i])
    med = jnp.where(n > 0, med, 0.0)
    return med / 0.6744897501960817


def _box_mean_valid(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Uniform (size x size) VALID mean filter, separable: (H+s-1, W+s-1) -> (H, W)."""
    kv = jnp.full((size, 1, 1, 1), 1.0 / size, x.dtype)
    kh = jnp.full((1, size, 1, 1), 1.0 / size, x.dtype)
    y = x[None, :, :, None]
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(y, kv, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=_HI)
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=_HI)
    return y[0, :, :, 0]


def nl_means_denoise(
    img01: jnp.ndarray,
    sigma: jnp.ndarray | float,
    h: jnp.ndarray | float,
    patch_size: int = 5,
    patch_distance: int = 6,
) -> jnp.ndarray:
    """Fast non-local means on a [0,1] grayscale image.

    The skimage ``fast_mode`` formulation: for every search offset the patch
    distance is a box-filtered squared difference computed on the
    reflect-padded image; weights are ``exp(-max(d2 - 2*sigma^2, 0) / h^2)``.
    Offsets run over the (2*patch_distance+1)^2 window via ``lax.scan`` —
    compiled once, identical math to the Pallas kernel
    (tpusr.core.pallas_nlm), which is the fast TPU path.
    """
    d = patch_distance
    box = patch_size
    half_b = box // 2
    x = img01.astype(jnp.float32)
    H, W = x.shape
    pad = d + half_b
    xp = jnp.pad(x, ((pad, pad), (pad, pad)), mode="reflect")
    a0 = pad - half_b
    x0_ext = jax.lax.dynamic_slice(xp, (a0, a0), (H + box - 1, W + box - 1))

    offs = [(dy, dx) for dy in range(-d, d + 1) for dx in range(-d, d + 1)
            if (dy, dx) != (0, 0)]
    offs_arr = jnp.asarray(np.array(offs, dtype=np.int32))

    sig2 = jnp.asarray(sigma, jnp.float32) ** 2
    h2 = jnp.asarray(h, jnp.float32) ** 2

    def body(carry, off):
        num, den = carry
        dy, dx = off[0], off[1]
        xs_ext = jax.lax.dynamic_slice(xp, (a0 + dy, a0 + dx),
                                       (H + box - 1, W + box - 1))
        d2 = _box_mean_valid((x0_ext - xs_ext) ** 2, box)
        w = jnp.exp(-jnp.maximum(d2 - 2.0 * sig2, 0.0) / jnp.maximum(h2, 1e-12))
        shifted = jax.lax.dynamic_slice(xp, (pad + dy, pad + dx), (H, W))
        return (num + w * shifted, den + w), None

    num0 = x.astype(jnp.float32)  # central pixel, weight 1
    den0 = jnp.ones_like(x)
    (num, den), _ = jax.lax.scan(body, (num0, den0), offs_arr)
    return num / den


def non_local_means(hr_g: jnp.ndarray, lr_g01: jnp.ndarray,
                    use_pallas: bool | None = None) -> jnp.ndarray:
    """NLM-denoise the LR grayscale then Lanczos-upscale to HR size
    (classic_algorithms.py:44-59). `lr_g01` is the LR image scaled to [0,1]
    (img_as_float); the output stays in [0,1] like the reference
    (which feeds it to metrics against a [0,255] HR — a quirk we preserve
    in the harness for ranking parity).

    On TPU (and when the image fits the VMEM budget) the search runs in the
    Pallas kernel (tpusr.core.pallas_nlm, ~18x faster than the XLA scan);
    elsewhere the scan formulation is used. Both are bit-comparable (<1e-6).
    """
    sigma = estimate_sigma(lr_g01)
    h = 1.15 * sigma
    if use_pallas is None:
        # VMEM bound: the kernel keeps ~6 image-sized f32 buffers resident
        # (~25 B/pixel); 512x512 is ~6.5 MB of the 16 MB budget — a 1024^2
        # gate would hit Mosaic VMEM exhaustion instead of falling back
        use_pallas = (jax.default_backend() == "tpu"
                      and lr_g01.shape[0] * lr_g01.shape[1] <= 512 * 512)
    if use_pallas:
        from tpusr.core.pallas_nlm import nlm_denoise_pallas
        den = nlm_denoise_pallas(lr_g01, sigma, h)
    else:
        den = nl_means_denoise(lr_g01, sigma, h)
    return resize(den, hr_g.shape[:2], "lanczos4")


# ------------------------------------------------- edge-guided interpolation
_SOBEL_X64 = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)


def _sobel(img: jnp.ndarray, kern: np.ndarray) -> jnp.ndarray:
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="reflect")  # cv2 BORDER_REFLECT_101
    y = jax.lax.conv_general_dilated(
        p[None, :, :, None], jnp.asarray(kern)[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI)
    return y[0, :, :, 0]


def edge_guided_interpolation(ground_truth, image):
    """Bilinear upscale + 0.3x Sobel-magnitude sharpening prior
    (classic_algorithms.py:61-82). Grayscale [0,255]."""
    img = image.astype(jnp.float32)
    gx = _sobel(img, _SOBEL_X64)
    gy = _sobel(img, _SOBEL_X64.T)
    edges = jnp.hypot(gx, gy)
    out_hw = ground_truth.shape[:2]
    # reference upscales the uint8 image (rounded) but the float64 edge map
    upscaled = jnp.clip(jnp.round(resize(img, out_hw, "bilinear")), 0, 255)
    up_edges = resize(edges, out_hw, "bilinear")
    return jnp.clip(upscaled + 0.3 * up_edges, 0.0, 255.0)


# --------------------------------------------------- frequency extrapolation
def frequency_extrapolation(ground_truth, image):
    """Zero-pad the centered LR spectrum into the HR shape and invert
    (classic_algorithms.py:84-108). XLA FFT is native on TPU."""
    f = jnp.fft.fft2(image.astype(jnp.float32))
    fshift = jnp.fft.fftshift(f)
    rows, cols = image.shape
    pad_rows, pad_cols = ground_truth.shape[:2]
    row_start = pad_rows // 2 - rows // 2
    col_start = pad_cols // 2 - cols // 2
    f_padded = jnp.zeros((pad_rows, pad_cols), dtype=fshift.dtype)
    f_padded = jax.lax.dynamic_update_slice(f_padded, fshift, (row_start, col_start))
    img_up = jnp.fft.ifft2(jnp.fft.ifftshift(f_padded))
    return jnp.abs(img_up)
