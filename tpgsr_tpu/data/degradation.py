"""Synthetic-LR degradation helpers.

The reference vendors ~4.8k LoC of KAIR utilities of which exactly two
functions are live (SURVEY.md §2.8): ``fspecial('gaussian', 15, 1.)``
(utils/utils_deblur.py:526, used at dataset/dataset.py:32-34) and
``srmd_degradation`` (utils/utils_sisr.py:235, used by
``alignCollate_syn.degradation``, dataset/dataset.py:934-950: blur +
(optional) Gaussian noise).  Re-implemented here without scipy/cv2:
wrap-mode 2-D convolution via numpy FFT (exact for periodic boundary).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def fspecial_gaussian(hsize: int = 15, sigma: float = 1.0) -> np.ndarray:
    """MATLAB fspecial('gaussian', hsize, sigma): normalized 2-D kernel."""
    half = (hsize - 1) / 2.0
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    k = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    k[k < np.finfo(float).eps * k.max()] = 0.0
    return k / k.sum()


def _convolve_wrap(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """scipy.ndimage.convolve(mode='wrap') equivalent via FFT, per channel."""
    h, w = x.shape[:2]
    kh, kw = k.shape
    # circular conv out[i] = sum_d h[d] x[i-d] with h[d] = k[d + center]:
    # place k at the origin and roll its center to index (0, 0)
    pad = np.zeros((h, w), np.float64)
    pad[:kh, :kw] = k
    pad = np.roll(pad, (-(kh // 2), -(kw // 2)), axis=(0, 1))
    kf = np.fft.rfft2(pad)
    out = np.empty_like(x, dtype=np.float64)
    if x.ndim == 2:
        return np.fft.irfft2(np.fft.rfft2(x) * kf, s=(h, w))
    for c in range(x.shape[2]):
        out[..., c] = np.fft.irfft2(np.fft.rfft2(x[..., c]) * kf, s=(h, w))
    return out


def srmd_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """Blur with kernel k, wrap boundary (utils/utils_sisr.py:235-258; the
    reference's bicubic downsample step is commented out there too)."""
    return _convolve_wrap(np.asarray(x, np.float64), np.asarray(k, np.float64))


def degrade_image(
    img: Image.Image,
    kernel: np.ndarray,
    noise_level: float = 0.0,
    deterministic: bool = False,
) -> Image.Image:
    """``alignCollate_syn.degradation`` (dataset/dataset.py:934-950):
    blur + Gaussian noise, returned as a uint8 PIL image."""
    arr = srmd_degradation(np.array(img), kernel)
    if deterministic:
        np.random.seed(0)  # reference's eval reproducibility quirk
    arr = arr + np.random.normal(0, noise_level, arr.shape)
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


DEFAULT_BLUR_KERNEL = fspecial_gaussian(15, 1.0)
