"""Classic-SR comparison harness: batched, compiled evaluation of all eight
algorithms with the reference's metric protocol and ranking weights.

Mirrors ``super_resolucion_clasica.ipynb`` cells 3-17:
- interpolation family scored in color ([0,1] PSNR/SSIM) + 7 extended metrics;
- IBP/NLM/EGI/FREQ scored on grayscale with data_range 255 (NLM: hr range) —
  including the reference's quirk of scoring NLM's [0,1] float output directly
  against the [0,255] HR (which is why NLM ranks last at ~2 dB);
- per-algorithm wall-clock (compiled steady-state) and device-memory stats;
- summary + weighted ranking identical to cell 17's weights.
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.classic import algorithms as A
from tpusr.metrics.image import (
    ssim_skimage, mae, rmse, gradient_mse, epi,
    hf_energy_ratio, kl_divergence, kl_divergence_color, rgb_to_gray,
)
from tpusr.metrics.stats import build_metrics_summary, rank_algorithms

CLASSIC_ALGORITHMS = ["bilinear", "bicubic", "area", "lanczos", "ibp", "nlm", "egi", "freq"]

RANKING_WEIGHTS = {  # super_resolucion_clasica.ipynb cell 17
    "psnr_mean": 0.25, "ssim_mean": 0.25, "time_mean": 0.15, "memory_mean": 0.10,
    "mae_mean": 0.05, "rmse_mean": 0.05, "grad_mse_mean": 0.05,
    "kl_luma_mean": 0.05, "kl_color_mean": 0.05,
}


def _psnr_range(a, b, data_range):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    mse = jnp.mean(d * d)
    return 10.0 * jnp.log10((data_range * data_range) / mse)


def _gray_cv2_u8(img_u8):
    """cv2 RGB2GRAY on uint8 rounds to nearest; mirror that."""
    g = rgb_to_gray(img_u8.astype(jnp.float32))
    return jnp.round(g)


def _color_metrics(hr_u8, sr_u8):
    """Metric block for the interpolation family (color, cell 7)."""
    hr_f = hr_u8.astype(jnp.float32) / 255.0
    sr_f = sr_u8.astype(jnp.float32) / 255.0
    hr_g = _gray_cv2_u8(hr_u8)
    sr_g = _gray_cv2_u8(sr_u8)
    return {
        "psnr": _psnr_range(hr_f, sr_f, 1.0),
        "ssim": ssim_skimage(hr_f, sr_f, data_range=1.0, channel_axis=2),
        "mae": mae(hr_u8, sr_u8),
        "rmse": rmse(hr_u8, sr_u8),
        "grad": gradient_mse(hr_u8, sr_u8),
        "epi": epi(hr_u8, sr_u8),
        "hf": hf_energy_ratio(hr_g, sr_g),
        "kl_luma": kl_divergence(hr_g.astype(jnp.int32), sr_g.astype(jnp.int32)),
        "kl_color": kl_divergence_color(hr_u8, sr_u8),
    }


def _gray_metrics(hr_g, sr_g, data_range):
    """Metric block for the advanced algorithms (grayscale, cell 7)."""
    return {
        "psnr": _psnr_range(hr_g, sr_g, data_range),
        "ssim": ssim_skimage(hr_g, sr_g, data_range=data_range),
        "mae": mae(hr_g, sr_g),
        "rmse": rmse(hr_g, sr_g),
        "grad": gradient_mse(hr_g, sr_g),
        "epi": epi(hr_g, sr_g),
        "hf": hf_energy_ratio(hr_g, sr_g),
        "kl_luma": kl_divergence(hr_g.astype(jnp.int32), sr_g.astype(jnp.int32)),
        "kl_color": jnp.nan,
    }


def _build_pair_fn(hr_hw, lr_hw):
    """One compiled function per (HR, LR) shape: runs all 8 algorithms and all
    metric families in a single XLA graph."""
    out_hw = hr_hw

    @jax.jit
    def pair_fn(hr_u8f, lr_u8f):
        metrics = {}

        for name, fn in (("bilinear", A.interpolate_bilinear),
                         ("bicubic", A.interpolate_bicubic),
                         ("area", A.interpolate_area),
                         ("lanczos", A.interpolate_lanczos)):
            sr = jnp.clip(jnp.round(fn(lr_u8f, out_hw)), 0, 255)
            metrics[name] = _color_metrics(hr_u8f, sr)

        hr_g = _gray_cv2_u8(hr_u8f)
        lr_g = _gray_cv2_u8(lr_u8f)

        ibp = jnp.floor(A.back_projection(hr_g, lr_g, iterations=10))  # uint8 truncation
        metrics["ibp"] = _gray_metrics(hr_g, ibp, 255.0)

        nlm = A.non_local_means(hr_g, lr_g / 255.0)  # stays [0,1]: reference quirk
        dr = jnp.where(hr_g.max() != hr_g.min(), hr_g.max() - hr_g.min(), 255.0)
        metrics["nlm"] = _gray_metrics(hr_g, nlm, dr)

        egi = jnp.floor(A.edge_guided_interpolation(hr_g, lr_g))
        metrics["egi"] = _gray_metrics(hr_g, egi, 255.0)

        freq = A.frequency_extrapolation(hr_g, lr_g)
        mx = freq.max()
        freq_u8 = jnp.where(mx > 0, jnp.floor(freq / mx * 255.0), jnp.floor(freq))
        metrics["freq"] = _gray_metrics(hr_g, freq_u8, 255.0)

        # metrics only: returning the 8 HR-sized SR images too would ship
        # ~8x the image bytes out as jit outputs the caller discards
        return metrics

    # Individually-jitted algorithm runs for timing (steady-state per algorithm).
    timed = {
        "bilinear": jax.jit(lambda lr: A.interpolate_bilinear(lr, out_hw)),
        "bicubic": jax.jit(lambda lr: A.interpolate_bicubic(lr, out_hw)),
        "area": jax.jit(lambda lr: A.interpolate_area(lr, out_hw)),
        "lanczos": jax.jit(lambda lr: A.interpolate_lanczos(lr, out_hw)),
        "ibp": jax.jit(lambda hrg, lrg: A.back_projection(hrg, lrg, 10)),
        "nlm": jax.jit(lambda hrg, lrg: A.non_local_means(hrg, lrg / 255.0)),
        "egi": jax.jit(lambda hrg, lrg: A.edge_guided_interpolation(hrg, lrg)),
        "freq": jax.jit(lambda hrg, lrg: A.frequency_extrapolation(hrg, lrg)),
    }
    return pair_fn, timed


def _compiled_memory_bytes(jitted, *args) -> float:
    """Per-algorithm device-memory footprint from XLA's memory analysis of
    the standalone compiled executable (arguments + outputs + temporaries).
    Order-independent and per-algorithm, unlike the device's monotonic
    process-global ``peak_bytes_in_use`` (which, sampled mid-run, reports
    essentially the same ever-growing number for every algorithm)."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
        return float(ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes)
    except Exception:
        return 0.0


def run_classic_comparison(hr_images, lr_images, time_repeats: int = 1, progress=None):
    """Evaluate all 8 classic algorithms over HR/LR uint8 RGB pairs.

    Returns (summary, ranked, scores, per_image_stats) with the reference's
    summary schema and cell-17 ranking weights.
    """
    stats = {k: defaultdict(list) for k in (
        "time", "memory", "psnr", "ssim", "mae", "rmse", "grad", "epi", "hf",
        "kl_luma", "kl_color")}
    fn_cache: dict = {}

    for idx, (hr, lr) in enumerate(zip(hr_images, lr_images)):
        hr = np.asarray(hr)
        lr = np.asarray(lr)
        key = (hr.shape, lr.shape)
        if key not in fn_cache:
            fn_cache[key] = _build_pair_fn(hr.shape[:2], lr.shape[:2]) + ({},)
        pair_fn, timed, mem_cache = fn_cache[key]

        hr_d = jnp.asarray(hr.astype(np.float32))
        lr_d = jnp.asarray(lr.astype(np.float32))
        hr_g = jnp.round(rgb_to_gray(hr_d))
        lr_g = jnp.round(rgb_to_gray(lr_d))

        # -- metrics (one fused graph) --
        metrics = pair_fn(hr_d, lr_d)
        metrics = jax.tree.map(float, jax.device_get(metrics))
        for alg, md in metrics.items():
            for mname, key2 in (("psnr", "psnr"), ("ssim", "ssim"), ("mae", "mae"),
                                ("rmse", "rmse"), ("grad", "grad"), ("epi", "epi"),
                                ("hf", "hf"), ("kl_luma", "kl_luma"),
                                ("kl_color", "kl_color")):
                stats[mname][alg].append(md[key2])

        # -- timing + device memory per algorithm (compiled steady-state) --
        for alg, f in timed.items():
            args = (lr_d,) if alg in ("bilinear", "bicubic", "area", "lanczos") else (hr_g, lr_g)
            f(*args).block_until_ready()  # warm-up / ensure compiled
            t0 = time.perf_counter()
            for _ in range(time_repeats):
                out = f(*args)
            out.block_until_ready()
            stats["time"][alg].append((time.perf_counter() - t0) / time_repeats)
            if alg not in mem_cache:  # per (algorithm, shape): bytes
                mem_cache[alg] = _compiled_memory_bytes(f, *args)
            stats["memory"][alg].append(mem_cache[alg])

        if progress is not None:
            progress(idx)

    summary = build_metrics_summary(
        stats["time"], stats["memory"], stats["psnr"], stats["ssim"],
        stats["mae"], stats["rmse"], stats["grad"], stats["epi"],
        stats["hf"], stats["kl_luma"], stats["kl_color"])
    ranked, scores, _ = rank_algorithms(
        summary,
        maximize=["psnr_mean", "ssim_mean"],
        minimize=["time_mean", "memory_mean", "mae_mean", "rmse_mean",
                  "grad_mse_mean", "kl_luma_mean", "kl_color_mean"],
        weights=RANKING_WEIGHTS)
    return summary, ranked, scores, stats
