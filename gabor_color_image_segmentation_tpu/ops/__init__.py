"""Core ops: color transform, Gabor bank, feature extraction (XLA + Pallas)."""

from gabor_color_image_segmentation_tpu.ops.color import rgb_to_lab, srgb_to_linear
from gabor_color_image_segmentation_tpu.ops.bank import (
    GaborBank,
    gabor_kernel,
    gaussian_kernel_1d,
    make_bank,
)

__all__ = [
    "rgb_to_lab",
    "srgb_to_linear",
    "GaborBank",
    "gabor_kernel",
    "gaussian_kernel_1d",
    "make_bank",
]
