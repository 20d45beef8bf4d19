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
from tpgsr_tpu.ops.grid_sample import grid_sample
from tpgsr_tpu.ops.gumbel import gumbel_softmax
from tpgsr_tpu.ops.rnn import bigru, bigru_fused, bilstm, bilstm_fused

__all__ = [
    "grid_sample",
    "gumbel_softmax",
    "bigru",
    "bigru_fused",
    "bilstm",
    "bilstm_fused",
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
