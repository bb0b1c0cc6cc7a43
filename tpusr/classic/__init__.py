from tpusr.classic.algorithms import (
    interpolate_bilinear,
    interpolate_bicubic,
    interpolate_area,
    interpolate_lanczos,
    back_projection,
    estimate_sigma,
    non_local_means,
    edge_guided_interpolation,
    frequency_extrapolation,
)
from tpusr.classic.harness import run_classic_comparison, CLASSIC_ALGORITHMS
