from kmunet_tpu.ops.spline import bspline_basis, make_uniform_grid
from kmunet_tpu.ops.sample import (
    grid_sample_bilinear,
    bilinear_gather,
    resize_bilinear,
)
from kmunet_tpu.ops.dwt import haar_dwt2d
from kmunet_tpu.ops.ssim import gaussian_kernel_1d, ssim_valid, ssim_torchmetrics

__all__ = [
    "bspline_basis",
    "make_uniform_grid",
    "grid_sample_bilinear",
    "bilinear_gather",
    "resize_bilinear",
    "haar_dwt2d",
    "gaussian_kernel_1d",
    "ssim_valid",
    "ssim_torchmetrics",
]
