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
    img: Image.Image, size: Tuple[int, int], mask: bool = False,
    as_uint8: bool = False,
) -> np.ndarray:
    """PIL bicubic resize to (W, H) ``size``; returns [H, W, C(+1)] float32.

    Note: the mask is computed from the *resized* image, as in the reference.
    Same-size fast path: PIL's bicubic kernel is exactly the identity at
    integer positions (verified bit-exact in tests), and TextZoom's stored
    pairs are already at the target geometry, so skipping the no-op resize
    removes most of the collate's per-image cost on the canonical path.

    ``as_uint8=True`` returns the pre-normalization uint8 array (mask channel
    {0,255}) — the compact wire format: PIL decodes to uint8 anyway, so
    dividing by 255 *on the device* is bit-identical to dividing here, and
    the host->device transfer shrinks 4x (tpgsr_tpu.train.step normalizes).
    """
    if img.size != size:
        img = img.resize(size, Image.BICUBIC)
    if as_uint8:
        arr = np.asarray(img.convert("RGB"), np.uint8)
        if mask:
            gray = np.asarray(img.convert("L"))
            m = np.where(gray > gray.mean(), 0, 255).astype(np.uint8)
            arr = np.concatenate([arr, m[..., None]], axis=-1)
        return arr
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


def resize_normalize_random_crop(
    img: Image.Image, size: Tuple[int, int], mask: bool = False, interval=None
) -> np.ndarray:
    """``resizeNormalizeRandomCrop`` (dataset.py:656-688).

    NOTE reference quirk: the condition ``if w < 32 or not interval is None``
    means a *given* interval triggers the plain-resize branch, so the random
    horizontal crop is effectively a no-op in alignCollate_realWTL_withcrop
    (dataset.py:1341-1347).  Mirrored faithfully.
    """
    w, _ = img.size
    if w < 32 or interval is not None:
        return resize_normalize(img, size, mask)
    arr = np.array(img)
    h, w = arr.shape[:2]
    # unreachable in the reference path (interval is None here); kept for API
    cropped = Image.fromarray(arr)
    return resize_normalize(cropped, size, mask)


def resize_normalize_keep_ratio(
    img: Image.Image, size: Tuple[int, int], mask: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """``resizeNormalizeKeepRatio`` (dataset.py:689-763): resize to target
    height keeping aspect, center-pad width with zeros; returns
    (image [H,W,C(+1)], valid-mask at 2x target size [2H,2W])."""
    tw, th = size
    ow, oh = img.size
    ratio = ow / float(oh)
    re_w = int(th * ratio)
    if re_w > tw:
        arr = resize_normalize(img, size, mask)
        valid = np.ones((th, tw), np.float32)
    else:
        small = img.resize((re_w, th), Image.BICUBIC)
        arr_small = np.asarray(small.convert("RGB"), np.float32) / 255.0
        shift = (tw - re_w) // 2
        arr = np.zeros((th, tw, 3), np.float32)
        arr[:, shift : shift + re_w] = arr_small
        valid = np.zeros((th, tw), np.float32)
        valid[:, shift : shift + re_w] = 1.0
        if mask:
            m = contour_mask(small)[..., 0]
            full = np.zeros((th, tw, 1), np.float32)
            full[:, shift : shift + re_w, 0] = m
            arr = np.concatenate([arr, full], axis=-1)
    valid2x = np.repeat(np.repeat(valid, 2, axis=0), 2, axis=1)
    return arr, valid2x
