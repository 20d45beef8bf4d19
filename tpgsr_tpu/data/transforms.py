"""Host-side image transforms (PIL-backed for bit-identical preprocessing).

Parity target: dataset/dataset.py:615-652 — ``resizeNormalize``: PIL bicubic
resize -> ToTensor ([0,1]) -> optional 4th contour-mask channel (grayscale
thresholded at its own mean: 0 where gray > mean else 255, then /255).

These run on the host (numpy) inside the input pipeline; the in-graph
equivalents live in tpgsr_tpu.ops.resize.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image


def contour_mask(img: Image.Image) -> np.ndarray:
    """Mean-threshold binary mask of the grayscale image, [H,W,1] in {0,1}."""
    gray = img.convert("L")
    arr = np.asarray(gray)
    thres = arr.mean()
    mask = np.where(arr > thres, 0, 255).astype(np.uint8)
    return (mask.astype(np.float32) / 255.0)[..., None]


def resize_normalize(
    img: Image.Image, size: Tuple[int, int], mask: bool = False
) -> np.ndarray:
    """PIL bicubic resize to (W, H) ``size``; returns [H, W, C(+1)] float32.

    Note: the mask is computed from the *resized* image, as in the reference.
    """
    img = img.resize(size, Image.BICUBIC)
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    if mask:
        arr = np.concatenate([arr, contour_mask(img)], axis=-1)
    return arr


def normalize(img: Image.Image, mask: bool = False) -> np.ndarray:
    """ToTensor without resizing (dataset.py:635-652)."""
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    if mask:
        arr = np.concatenate([arr, contour_mask(img)], axis=-1)
    return arr


def pil_downsample(img: Image.Image, factor: int) -> Image.Image:
    """Bicubic downsample by an integer factor (alignCollate_syn,
    dataset.py:984-986)."""
    return img.resize((img.size[0] // factor, img.size[1] // factor), Image.BICUBIC)
