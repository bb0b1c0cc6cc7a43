"""Dataset-quality EDA — reference ``data/EDA.ipynb`` (1142 LoC).

Per LR/HR pair: LPIPS (optional — torch `lpips` gated), PSNR, SSIM, GLCM
contrast/homogeneity/correlation, RMS noise, Laplacian variance, DCT blocking
score, color noise, Canny-ring ringing, saturation/brightness means,
per-channel skew/kurtosis, Sobel edge-energy diff. Plus global accumulators
(mean FFT spectra, HR gradient energy, LR GLCM, saturation histograms) and
best/worst-LPIPS example dumps. Output: metrics DataFrame + report panels.

GLCM is implemented directly (numpy co-occurrence; skimage is not available
in this environment) with graycomatrix/graycoprops semantics: offset (0, 1),
symmetric, normalized.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import scipy.stats

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

try:
    import lpips as _lpips_mod
    import torch as _torch
except Exception:
    _lpips_mod = None
    _torch = None

import jax.numpy as jnp

from tpusr.metrics.image import ssim_skimage

_LPIPS_MODEL = None


# ------------------------------------------------------------------ pair I/O
def iter_pairs(lr_base, hr_base):
    """Matching relative paths present in both trees (EDA cell 2)."""
    exts = (".png", ".jpg", ".jpeg")

    def walk(base):
        rels = set()
        for root, _, files in os.walk(base):
            for f in files:
                if f.lower().endswith(exts):
                    rels.add(os.path.relpath(os.path.join(root, f), base))
        return rels

    common = sorted(walk(lr_base) & walk(hr_base))
    if not common:
        raise ValueError("No matching LR/HR image pairs were found.")
    return [(r, r) for r in common]


def load_and_align(lr_path, hr_path, interp_map=None):
    """Load BGR pair; upscale LR to HR size with the recorded interpolation."""
    lr = cv2.imread(lr_path)
    hr = cv2.imread(hr_path)
    if lr is None or hr is None:
        raise ValueError(f"Failed reading {lr_path} or {hr_path}")
    if lr.shape[:2] != hr.shape[:2]:
        code = cv2.INTER_CUBIC
        if interp_map:
            name = interp_map.get(os.path.basename(lr_path))
            code = {"INTER_LINEAR": cv2.INTER_LINEAR, "INTER_CUBIC": cv2.INTER_CUBIC,
                    "INTER_AREA": cv2.INTER_AREA,
                    "INTER_LANCZOS4": cv2.INTER_LANCZOS4}.get(name, cv2.INTER_CUBIC)
        lr = cv2.resize(lr, (hr.shape[1], hr.shape[0]), interpolation=code)
    return lr, hr


# ------------------------------------------------------------------- metrics
_LPIPS_JAX_W = None


def lpips_score(lr_bgr, hr_bgr):
    """LPIPS(alex) on BGR->RGB [-1,1] tensors. Resolution order:
    1. the torch ``lpips`` package, if installed (reference EDA's path);
    2. the JAX port (tpusr.metrics.lpips) with offline-provisioned weights
       ($TPUSR_LPIPS_WEIGHTS or weights/lpips_alex.npz — see
       ``python -m tpusr.tools.lpips_weights``);
    3. None (the LPIPS column and scenario dumps degrade gracefully)."""
    global _LPIPS_MODEL, _LPIPS_JAX_W
    if _lpips_mod is not None:
        if _LPIPS_MODEL is None:
            _LPIPS_MODEL = _lpips_mod.LPIPS(net="alex")

        def to_tensor(img):
            x = cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0
            x = 2 * x - 1
            return _torch.from_numpy(
                np.transpose(x, (2, 0, 1))).unsqueeze(0).float()

        return float(_LPIPS_MODEL(to_tensor(lr_bgr), to_tensor(hr_bgr)).item())

    if _LPIPS_JAX_W is None:
        from tpusr.tools.lpips_weights import default_weights_path

        path = default_weights_path()
        if path is None:
            return None
        from tpusr.metrics.lpips import load_lpips_npz

        _LPIPS_JAX_W = load_lpips_npz(path)
    from tpusr.metrics.lpips import lpips_alex_from_uint8_rgb

    return lpips_alex_from_uint8_rgb(
        _LPIPS_JAX_W,
        cv2.cvtColor(lr_bgr, cv2.COLOR_BGR2RGB),
        cv2.cvtColor(hr_bgr, cv2.COLOR_BGR2RGB))


def psnr_metric(lr_img, hr_img):
    mse = np.mean((hr_img.astype(np.float64) - lr_img.astype(np.float64)) ** 2)
    return float(10.0 * np.log10(255.0**2 / mse)) if mse > 0 else np.inf


def ssim_metric(lr_img, hr_img):
    return float(ssim_skimage(jnp.asarray(hr_img.astype(np.float32)),
                              jnp.asarray(lr_img.astype(np.float32)),
                              data_range=255, channel_axis=2))


def glcm_matrix(gray_u8: np.ndarray, levels: int = 256) -> np.ndarray:
    """Symmetric, normalized co-occurrence matrix at offset (0, 1)
    (graycomatrix semantics for distances=[1], angles=[0])."""
    a = gray_u8[:, :-1].ravel().astype(np.int64)
    b = gray_u8[:, 1:].ravel().astype(np.int64)
    m = np.zeros((levels, levels), np.float64)
    np.add.at(m, (a, b), 1.0)
    m = m + m.T  # symmetric
    s = m.sum()
    return m / s if s else m


def glcm_features(gray_u8, angles=None, levels=64, multi_angle=False):
    """contrast / homogeneity / correlation (graycoprops formulas), averaged
    over angles. Angles beyond 0 use the corresponding pixel offsets."""
    if angles is None:
        angles = (0, np.pi / 4, np.pi / 2, 3 * np.pi / 4) if multi_angle else (0,)
    if gray_u8.max() == 0:
        norm = np.zeros_like(gray_u8, dtype=np.uint8)
    else:
        norm = ((gray_u8.astype(np.float32) / 255.0) * (levels - 1)).astype(np.uint8)

    offsets = {0: (0, 1), np.pi / 4: (-1, 1), np.pi / 2: (-1, 0),
               3 * np.pi / 4: (-1, -1)}
    i_idx = np.arange(levels, dtype=np.float64)
    cons, homs, cors = [], [], []
    for ang in angles:
        dy, dx = offsets.get(ang, (0, 1))
        h, w = norm.shape
        y0, y1 = max(0, -dy), min(h, h - dy)
        x0, x1 = max(0, -dx), min(w, w - dx)
        a = norm[y0:y1, x0:x1].ravel().astype(np.int64)
        b = norm[y0 + dy:y1 + dy, x0 + dx:x1 + dx].ravel().astype(np.int64)
        m = np.zeros((levels, levels), np.float64)
        np.add.at(m, (a, b), 1.0)
        m = m + m.T
        s = m.sum()
        p = m / s if s else m
        ii, jj = np.meshgrid(i_idx, i_idx, indexing="ij")
        cons.append(float((p * (ii - jj) ** 2).sum()))
        homs.append(float((p / (1.0 + (ii - jj) ** 2)).sum()))
        mu_i = (p * ii).sum()
        mu_j = (p * jj).sum()
        sd_i = np.sqrt((p * (ii - mu_i) ** 2).sum())
        sd_j = np.sqrt((p * (jj - mu_j) ** 2).sum())
        if sd_i > 1e-15 and sd_j > 1e-15:
            cors.append(float(((p * (ii - mu_i) * (jj - mu_j)).sum()) / (sd_i * sd_j)))
        else:
            cors.append(1.0)
    return {"glcm_contrast": float(np.mean(cons)),
            "glcm_homogeneity": float(np.mean(homs)),
            "glcm_correlation": float(np.mean(cors))}


def rms_noise(gray_u8):
    blurred = cv2.GaussianBlur(gray_u8, (3, 3), 0)
    diff = gray_u8.astype(np.float32) - blurred.astype(np.float32)
    return float(np.sqrt(np.mean(diff**2)))


def laplacian_variance(gray_u8):
    return float(cv2.Laplacian(gray_u8, cv2.CV_64F).var())


def feature_distribution(img_bgr, hsv):
    out = {}
    for idx, ch in enumerate(cv2.split(img_bgr)):
        flat = ch.ravel()
        out[f"ch{idx}_mean"] = float(np.mean(flat))
        out[f"ch{idx}_std"] = float(np.std(flat))
        out[f"ch{idx}_skew"] = float(scipy.stats.skew(flat))
        out[f"ch{idx}_kurt"] = float(scipy.stats.kurtosis(flat))
    out["saturation_mean"] = float(np.mean(hsv[:, :, 1]))
    out["brightness_mean"] = float(np.mean(hsv[:, :, 2]))
    return out


def detect_artifacts(img_bgr, gray_u8):
    dct = cv2.dct(np.float32(gray_u8))
    blocking = float((np.mean(np.abs(dct[7::8, :])) +
                      np.mean(np.abs(dct[:, 7::8]))) / 2)
    blur = cv2.GaussianBlur(img_bgr, (5, 5), 0)
    color_noise = float(np.mean(np.abs(img_bgr.astype(float) - blur.astype(float))))
    edges = cv2.Canny(gray_u8, 100, 200)
    dilated = cv2.dilate(edges, np.ones((5, 5), np.uint8))
    ring_region = dilated & ~edges
    ringing = float(np.std(gray_u8[ring_region.astype(bool)])) if np.any(ring_region) else 0.0
    return {"blocking_score": blocking, "color_noise": color_noise,
            "ringing_artifact": ringing}


_SOBEL_H = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float64) / 4.0


def sobel_energy(gray_u8):
    """skimage.filters.sobel-style normalized gradient magnitude mean."""
    g = gray_u8.astype(np.float64) / 255.0
    sh = cv2.filter2D(g, -1, _SOBEL_H)
    sv = cv2.filter2D(g, -1, _SOBEL_H.T)
    return float(np.mean(np.sqrt(sh**2 + sv**2)))


# ----------------------------------------------------------------- pipeline
def collect_metrics(lr_dir, hr_dir, glcm_multi_angle=False, glcm_levels=64,
                    interp_map=None, limit=None, progress=None):
    rows = []
    sat_bins = np.linspace(0, 256, 51)
    gd = {"count": 0, "lr_fft_sum": None, "hr_fft_sum": None,
          "grad_hr_sum": None, "glcm_sum": None,
          "sat_lr_counts": np.zeros(50), "sat_hr_counts": np.zeros(50),
          "sat_bins": sat_bins, "noise_means_lr": []}

    pairs = iter_pairs(lr_dir, hr_dir)
    if limit:
        pairs = pairs[:limit]
    for lf, hf in pairs:
        lr_img, hr_img = load_and_align(os.path.join(lr_dir, lf),
                                        os.path.join(hr_dir, hf), interp_map)
        gray_lr = cv2.cvtColor(lr_img, cv2.COLOR_BGR2GRAY)
        gray_hr = cv2.cvtColor(hr_img, cv2.COLOR_BGR2GRAY)
        hsv_lr = cv2.cvtColor(lr_img, cv2.COLOR_BGR2HSV)
        hsv_hr = cv2.cvtColor(hr_img, cv2.COLOR_BGR2HSV)

        glcm = glcm_features(gray_lr, levels=glcm_levels,
                             multi_angle=glcm_multi_angle)
        fd_lr = feature_distribution(lr_img, hsv_lr)
        fd_hr = feature_distribution(hr_img, hsv_hr)
        art_lr = detect_artifacts(lr_img, gray_lr)
        art_hr = detect_artifacts(hr_img, gray_hr)

        row = {
            "filename": lf.replace("\\", "/"),
            "lpips": lpips_score(lr_img, hr_img),
            "psnr": psnr_metric(lr_img, hr_img),
            "ssim": ssim_metric(lr_img, hr_img),
            **glcm,
            "rms_noise_lr": rms_noise(gray_lr), "rms_noise_hr": rms_noise(gray_hr),
            "lap_var_lr": laplacian_variance(gray_lr),
            "lap_var_hr": laplacian_variance(gray_hr),
            "blocking_lr": art_lr["blocking_score"],
            "blocking_hr": art_hr["blocking_score"],
            "color_noise_lr": art_lr["color_noise"],
            "color_noise_hr": art_hr["color_noise"],
            "ringing_lr": art_lr["ringing_artifact"],
            "ringing_hr": art_hr["ringing_artifact"],
            "saturation_mean_lr": fd_lr["saturation_mean"],
            "saturation_mean_hr": fd_hr["saturation_mean"],
            "brightness_mean_lr": fd_lr["brightness_mean"],
            "brightness_mean_hr": fd_hr["brightness_mean"],
            "edge_diff": sobel_energy(gray_hr) - sobel_energy(gray_lr),
        }
        for c in range(3):
            for stat in ("skew", "kurt"):
                row[f"ch{c}_{stat}_lr"] = fd_lr[f"ch{c}_{stat}"]
                row[f"ch{c}_{stat}_hr"] = fd_hr[f"ch{c}_{stat}"]
        rows.append(row)

        # global accumulators
        lr_fft = np.abs(np.fft.fftshift(np.fft.fft2(gray_lr)))
        hr_fft = np.abs(np.fft.fftshift(np.fft.fft2(gray_hr)))
        sx = cv2.Sobel(gray_hr, cv2.CV_64F, 1, 0, ksize=5)
        sy = cv2.Sobel(gray_hr, cv2.CV_64F, 0, 1, ksize=5)
        grad = np.sqrt(sx**2 + sy**2)
        glcm_full = glcm_matrix(gray_lr, 256)
        if gd["lr_fft_sum"] is None:
            gd["lr_fft_sum"], gd["hr_fft_sum"] = lr_fft, hr_fft
            gd["grad_hr_sum"], gd["glcm_sum"] = grad, glcm_full
        else:
            # mixed-resolution datasets: the spatial accumulators are seeded
            # by the first pair's shape; resize later maps onto that grid
            # (glcm/saturation/noise stats are shape-free and unaffected)
            # instead of crashing the whole EDA on a broadcast error
            ref_hw = gd["hr_fft_sum"].shape[::-1]  # (w, h) for cv2
            if grad.shape != gd["grad_hr_sum"].shape:
                lr_fft = cv2.resize(lr_fft, gd["lr_fft_sum"].shape[::-1],
                                    interpolation=cv2.INTER_AREA)
                hr_fft = cv2.resize(hr_fft, ref_hw,
                                    interpolation=cv2.INTER_AREA)
                grad = cv2.resize(grad, gd["grad_hr_sum"].shape[::-1],
                                  interpolation=cv2.INTER_AREA)
            gd["lr_fft_sum"] += lr_fft
            gd["hr_fft_sum"] += hr_fft
            gd["grad_hr_sum"] += grad
            gd["glcm_sum"] += glcm_full
        gd["sat_lr_counts"] += np.histogram(hsv_lr[:, :, 1], bins=sat_bins)[0]
        gd["sat_hr_counts"] += np.histogram(hsv_hr[:, :, 1], bins=sat_bins)[0]
        gd["noise_means_lr"].append(art_lr["color_noise"])
        gd["count"] += 1
        if progress:
            progress(gd["count"])
    return rows, gd


def dataframe(rows):
    return pd.DataFrame(rows)


def summary(df):
    return df.describe().T[["mean", "std", "25%", "50%", "75%"]]


# -------------------------------------------------------------------- plots
def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def save_visual_example(lr_img, hr_img, output_path, lpips_val):
    plt = _plt()
    lr_resized = cv2.resize(lr_img, (hr_img.shape[1], hr_img.shape[0]),
                            interpolation=cv2.INTER_CUBIC)
    diff = cv2.absdiff(lr_resized, hr_img)
    diff_color = cv2.applyColorMap(
        cv2.convertScaleAbs(cv2.cvtColor(diff, cv2.COLOR_BGR2GRAY)),
        cv2.COLORMAP_JET)
    _, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(cv2.cvtColor(lr_resized, cv2.COLOR_BGR2RGB))
    axes[0].set_title("Rescaled LR")
    axes[1].imshow(cv2.cvtColor(hr_img, cv2.COLOR_BGR2RGB))
    axes[1].set_title("HR")
    lp = f"{lpips_val:.4f}" if lpips_val is not None else "n/a"
    axes[2].imshow(cv2.cvtColor(diff_color, cv2.COLOR_BGR2RGB))
    axes[2].set_title(f"Difference map\nLPIPS: {lp}")
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    os.makedirs(os.path.dirname(output_path), exist_ok=True)
    plt.savefig(output_path)
    plt.close()


def create_advanced_visualizations(lr_img, hr_img, output_path):
    """Per-pair 6-panel: LR/HR spectra, HR gradient magnitude, LR GLCM,
    LR noise map, saturation distributions (EDA.ipynb cell 8)."""
    plt = _plt()
    gray_lr = cv2.cvtColor(lr_img, cv2.COLOR_BGR2GRAY)
    gray_hr = cv2.cvtColor(hr_img, cv2.COLOR_BGR2GRAY)
    fig, axes = plt.subplots(2, 3, figsize=(20, 10))
    axes[0, 0].imshow(np.log1p(np.abs(np.fft.fftshift(np.fft.fft2(gray_lr)))),
                      cmap="magma")
    axes[0, 0].set_title("LR spectrum (log)")
    axes[0, 1].imshow(np.log1p(np.abs(np.fft.fftshift(np.fft.fft2(gray_hr)))),
                      cmap="magma")
    axes[0, 1].set_title("HR spectrum (log)")
    sx = cv2.Sobel(gray_hr, cv2.CV_64F, 1, 0, ksize=5)
    sy = cv2.Sobel(gray_hr, cv2.CV_64F, 0, 1, ksize=5)
    axes[0, 2].imshow(np.sqrt(sx**2 + sy**2), cmap="viridis")
    axes[0, 2].set_title("HR gradient magnitude")
    axes[1, 0].imshow(np.log1p(glcm_matrix(gray_lr, 256)), cmap="cividis")
    axes[1, 0].set_title("LR GLCM (log)")
    blur = cv2.GaussianBlur(gray_lr, (3, 3), 0)
    axes[1, 1].imshow(np.abs(gray_lr.astype(np.float32) - blur), cmap="inferno")
    axes[1, 1].set_title("LR noise map")
    hsv_lr = cv2.cvtColor(lr_img, cv2.COLOR_BGR2HSV)
    hsv_hr = cv2.cvtColor(hr_img, cv2.COLOR_BGR2HSV)
    axes[1, 2].hist(hsv_lr[:, :, 1].ravel(), bins=50, alpha=0.6, label="LR")
    axes[1, 2].hist(hsv_hr[:, :, 1].ravel(), bins=50, alpha=0.6, label="HR")
    axes[1, 2].set_title("Saturation distribution")
    axes[1, 2].legend()
    for ax in axes.ravel()[:5]:
        ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=120)
    plt.close(fig)


def artifact_color_histograms(df, output_dir):
    """LR-vs-HR histograms for the artifact metrics (EDA cell 10 output)."""
    plt = _plt()
    pairs = [("blocking_lr", "blocking_hr"), ("color_noise_lr", "color_noise_hr"),
             ("ringing_lr", "ringing_hr"), ("rms_noise_lr", "rms_noise_hr")]
    fig, axes = plt.subplots(2, 2, figsize=(14, 9))
    for ax, (lo, hi) in zip(axes.ravel(), pairs):
        ax.hist(df[lo].dropna(), bins=25, alpha=0.6, label="LR")
        ax.hist(df[hi].dropna(), bins=25, alpha=0.6, label="HR")
        ax.set_title(lo[:-3])
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "artifact_color_histograms.png"), dpi=130)
    plt.close(fig)


def channel_shape_bars(df, output_dir):
    """Mean per-channel skew/kurtosis bars, LR vs HR (EDA cell 10 output)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    xs = np.arange(3)
    for ax, stat in zip(axes, ("skew", "kurt")):
        lr_vals = [df[f"ch{c}_{stat}_lr"].mean() for c in range(3)]
        hr_vals = [df[f"ch{c}_{stat}_hr"].mean() for c in range(3)]
        ax.bar(xs - 0.2, lr_vals, 0.4, label="LR")
        ax.bar(xs + 0.2, hr_vals, 0.4, label="HR")
        ax.set_xticks(xs, [f"ch{c}" for c in range(3)])
        ax.set_title(f"Per-channel {stat} (mean)")
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "channel_shape_bars.png"), dpi=130)
    plt.close(fig)


def create_global_advanced_visualizations(gd, output_path):
    plt = _plt()
    n = max(1, gd["count"])
    fig, axes = plt.subplots(2, 3, figsize=(20, 10))
    axes[0, 0].imshow(np.log1p(gd["lr_fft_sum"] / n), cmap="magma")
    axes[0, 0].set_title("Mean LR spectrum (log)")
    axes[0, 1].imshow(np.log1p(gd["hr_fft_sum"] / n), cmap="magma")
    axes[0, 1].set_title("Mean HR spectrum (log)")
    axes[0, 2].imshow(gd["grad_hr_sum"] / n, cmap="viridis")
    axes[0, 2].set_title("Mean HR gradient magnitude")
    axes[1, 0].imshow(np.log1p(gd["glcm_sum"] / n), cmap="cividis")
    axes[1, 0].set_title("Mean LR GLCM (log)")
    centers = (gd["sat_bins"][:-1] + gd["sat_bins"][1:]) / 2
    axes[1, 1].plot(centers, gd["sat_lr_counts"], label="LR")
    axes[1, 1].plot(centers, gd["sat_hr_counts"], label="HR")
    axes[1, 1].set_title("Saturation histograms")
    axes[1, 1].legend()
    axes[1, 2].hist(gd["noise_means_lr"], bins=30, color="#4c72b0")
    axes[1, 2].set_title("LR color-noise distribution")
    for ax in axes.ravel()[:4]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(output_path, dpi=130)
    plt.close(fig)


def basic_distributions(df, output_dir):
    plt = _plt()
    keys = [k for k in ("lpips", "psnr", "ssim", "glcm_contrast",
                        "glcm_homogeneity", "glcm_correlation")
            if k in df and df[k].notna().any()]
    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    for ax, k in zip(axes.ravel(), keys):
        ax.hist(df[k].dropna(), bins=30, color="#55a868")
        ax.set_title(k)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "distributions.png"), dpi=130)
    plt.close(fig)


def artifact_boxplots(df, output_dir):
    plt = _plt()
    pairs = [("rms_noise_lr", "rms_noise_hr"), ("lap_var_lr", "lap_var_hr"),
             ("blocking_lr", "blocking_hr"), ("color_noise_lr", "color_noise_hr"),
             ("ringing_lr", "ringing_hr"),
             ("saturation_mean_lr", "saturation_mean_hr")]
    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    for ax, (lo, hi) in zip(axes.ravel(), pairs):
        ax.boxplot([df[lo].dropna(), df[hi].dropna()], tick_labels=["LR", "HR"])
        ax.set_title(lo[:-3])
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "artifact_boxplots.png"), dpi=130)
    plt.close(fig)


def correlation_matrix(df, output_dir):
    plt = _plt()
    num = df.select_dtypes(include=[np.number]).dropna(axis=1, how="all")
    corr = num.corr()
    fig, ax = plt.subplots(figsize=(14, 12))
    im = ax.imshow(corr.values, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(len(corr)), corr.columns, rotation=90, fontsize=6)
    ax.set_yticks(range(len(corr)), corr.columns, fontsize=6)
    fig.colorbar(im, shrink=0.8)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "correlation_matrix.png"), dpi=130)
    plt.close(fig)


def scatter_relations(df, output_dir):
    plt = _plt()
    rel = [("psnr", "ssim"), ("rms_noise_lr", "psnr"),
           ("blocking_lr", "ssim"), ("color_noise_lr", "psnr")]
    if "lpips" in df and df["lpips"].notna().any():
        rel = [("lpips", "psnr"), ("lpips", "ssim")] + rel[:2]
    fig, axes = plt.subplots(2, 2, figsize=(12, 9))
    for ax, (xk, yk) in zip(axes.ravel(), rel):
        ax.scatter(df[xk], df[yk], s=12, alpha=0.6)
        ax.set_xlabel(xk)
        ax.set_ylabel(yk)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "scatter_relations.png"), dpi=130)
    plt.close(fig)


def run_eda_pipeline(lr_dir, hr_dir, output_dir="eda_results", top_k_examples=1,
                     glcm_multi_angle=False, glcm_levels=64, interp_map_path="",
                     limit=None):
    """Full EDA (EDA.ipynb cell 10): metrics DataFrame + global panels +
    best/worst-LPIPS (or worst-PSNR fallback) example dumps."""
    os.makedirs(output_dir, exist_ok=True)
    interp_map = None
    if interp_map_path and os.path.exists(interp_map_path):
        with open(interp_map_path, "rb") as f:
            interp_map = pickle.load(f)

    rows, gd = collect_metrics(lr_dir, hr_dir, glcm_multi_angle, glcm_levels,
                               interp_map, limit=limit)
    df = dataframe(rows)
    df.to_csv(os.path.join(output_dir, "eda_metrics.csv"), index=False)
    summary(df.select_dtypes(include=[np.number])).to_csv(
        os.path.join(output_dir, "eda_summary.csv"))

    create_global_advanced_visualizations(
        gd, os.path.join(output_dir, "advanced_global_panel.png"))
    basic_distributions(df, output_dir)
    artifact_color_histograms(df, output_dir)
    artifact_boxplots(df, output_dir)
    channel_shape_bars(df, output_dir)
    correlation_matrix(df, output_dir)
    scatter_relations(df, output_dir)

    # best/worst scenario dumps (LPIPS if available, else PSNR)
    key = "lpips" if df["lpips"].notna().any() else "psnr"
    asc = df.sort_values(key, ascending=True)
    worst = asc.tail(top_k_examples) if key == "lpips" else asc.head(top_k_examples)
    best = asc.head(top_k_examples) if key == "lpips" else asc.tail(top_k_examples)
    for sub, dname in ((best, "best_scenarios"), (worst, "worst_scenarios")):
        for _, r in sub.iterrows():
            lr_img, hr_img = load_and_align(os.path.join(lr_dir, r["filename"]),
                                            os.path.join(hr_dir, r["filename"]),
                                            interp_map)
            base = os.path.basename(r["filename"])
            save_visual_example(
                lr_img, hr_img,
                os.path.join(output_dir, "LPIPS_Scenarios", dname, base),
                r["lpips"] if key == "lpips" else None)
            create_advanced_visualizations(
                lr_img, hr_img,
                os.path.join(output_dir, "LPIPS_Scenarios", dname,
                             "advanced_" + base))
    return df
