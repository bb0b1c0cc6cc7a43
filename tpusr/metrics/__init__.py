from tpusr.metrics.image import (
    psnr,
    ssim,
    mae,
    rmse,
    rgb_to_gray,
    sobel_mag,
    gradient_mse,
    epi,
    hf_energy_ratio,
    kl_divergence,
    kl_divergence_color,
)
from tpusr.metrics.stats import (
    bootstrap_ci,
    compute_summary_stats,
    build_metrics_summary,
    rank_algorithms,
)
