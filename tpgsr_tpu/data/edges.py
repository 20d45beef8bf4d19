"""Edge-based loss-weight masks (numpy re-implementation of the cv2 chain).

Parity target: ``lmdbDatasetWithMask_real.get_mask`` (dataset/dataset.py:
841-852): Canny(20, 150) on the grayscale HR -> dilate(5x5, 1 iter) ->
GaussianBlur(5x5, sigma 1) -> ``0.4 + (mask/255) * 0.5``.

cv2 is not available in this environment, so Canny is re-implemented
(gaussian smooth -> Sobel -> non-maximum suppression -> double-threshold
hysteresis).  Edge positions match cv2 closely but not bit-exactly (cv2 uses
its own gradient rounding); the downstream use is a soft loss weight in
[0.4, 0.9], so small boundary differences are immaterial.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _gaussian_kernel_1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return k / k.sum()


def _sep_filter(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    r = len(k) // 2
    pad = np.pad(img, ((r, r), (0, 0)), mode="reflect")
    out = sum(k[i] * pad[i : i + img.shape[0], :] for i in range(len(k)))
    pad = np.pad(out, ((0, 0), (r, r)), mode="reflect")
    return sum(k[i] * pad[:, i : i + img.shape[1]] for i in range(len(k)))


def canny(gray: np.ndarray, low: float = 20.0, high: float = 150.0) -> np.ndarray:
    """Binary edge map in {0, 255} (uint8), cv2.Canny-style thresholds on the
    L2 gradient magnitude of a 5x5-smoothed image."""
    img = np.asarray(gray, np.float64)
    k = _gaussian_kernel_1d(1.4, 2)
    img = _sep_filter(img, k)

    # Sobel gradients
    p = np.pad(img, 1, mode="reflect")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    )
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    )
    mag = np.hypot(gx, gy)
    ang = np.rad2deg(np.arctan2(gy, gx)) % 180.0

    # non-maximum suppression over 4 quantized directions
    m = np.pad(mag, 1)
    h, w = mag.shape
    n1 = np.zeros_like(mag)
    n2 = np.zeros_like(mag)
    c = m[1 : h + 1, 1 : w + 1]
    sel_0 = (ang < 22.5) | (ang >= 157.5)
    sel_45 = (ang >= 22.5) & (ang < 67.5)
    sel_90 = (ang >= 67.5) & (ang < 112.5)
    sel_135 = (ang >= 112.5) & (ang < 157.5)
    n1 = np.select(
        [sel_0, sel_45, sel_90, sel_135],
        [m[1 : h + 1, 2 : w + 2], m[0:h, 2 : w + 2], m[0:h, 1 : w + 1], m[0:h, 0:w]],
    )
    n2 = np.select(
        [sel_0, sel_45, sel_90, sel_135],
        [m[1 : h + 1, 0:w], m[2 : h + 2, 0:w], m[2 : h + 2, 1 : w + 1], m[2 : h + 2, 2 : w + 2]],
    )
    local_max = (c >= n1) & (c >= n2)
    mag = np.where(local_max, mag, 0.0)

    # hysteresis: strong seeds grow into weak neighbors (iterative dilation)
    strong = mag >= high
    weak = mag >= low
    edges = strong.copy()
    for _ in range(16):
        grown = np.pad(edges, 1)
        neigh = np.zeros_like(edges)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                neigh |= grown[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        new = neigh & weak
        if (new == edges).all():
            break
        edges = new
    return (edges * 255).astype(np.uint8)


def dilate(mask: np.ndarray, ksize: int = 5, iterations: int = 1) -> np.ndarray:
    """cv2.dilate with an all-ones ksize x ksize kernel."""
    out = mask.astype(bool)
    r = ksize // 2
    h, w = mask.shape
    for _ in range(iterations):
        p = np.pad(out, r)
        acc = np.zeros_like(out)
        for dy in range(ksize):
            for dx in range(ksize):
                acc |= p[dy : dy + h, dx : dx + w]
        out = acc
    return (out * 255).astype(np.uint8)


def gaussian_blur(img: np.ndarray, ksize: int = 5, sigma: float = 1.0) -> np.ndarray:
    """cv2.GaussianBlur((ksize,ksize), sigma) equivalent."""
    k = _gaussian_kernel_1d(sigma, ksize // 2)
    return _sep_filter(np.asarray(img, np.float64), k)


def edge_weight_mask(image: Image.Image) -> np.ndarray:
    """The full get_mask chain -> float64 weights in [0.4, 0.9]."""
    gray = np.asarray(image.convert("L"))
    e = canny(gray, 20, 150)
    e = dilate(e, 5, 1)
    e = gaussian_blur(e, 5, 1.0)
    return 0.4 + (e / 255.0) * 0.5
