from tpgsr_tpu.ops.image import (
    calculate_psnr,
    gradient_map,
    rgb_to_gray,
    ssim,
)
from tpgsr_tpu.ops.resize import (
    resize_matrix_torch,
    interpolate_bicubic,
    interpolate_bilinear,
)
from tpgsr_tpu.ops.ctc import ctc_greedy_ids, ctc_ids_to_strings, ctc_loss

__all__ = [
    "calculate_psnr",
    "gradient_map",
    "rgb_to_gray",
    "ssim",
    "resize_matrix_torch",
    "interpolate_bicubic",
    "interpolate_bilinear",
    "ctc_greedy_ids",
    "ctc_ids_to_strings",
    "ctc_loss",
]
