"""Image metrics and pixel ops (PSNR, SSIM, gradient prior map, grayscale).

These are acceptance metrics: numerics mirror the reference exactly.
  * PSNR: utils/ssim_psnr.py:9-15 (RGB channels only, [0,1] inputs scaled x255)
  * SSIM: utils/ssim_psnr.py:18-89 (11x11 Gaussian window sigma=1.5,
    same-padding depthwise convs, C1=0.01^2, C2=0.03^2)
  * gradient map: loss/image_loss.py:43-51 (central differences via pad+shift)
  * grayscale: interfaces/base.py:825-828 (ITU-R BT.601 weights)

Layout: all functions take NHWC arrays (TPU-native). The reference is NCHW;
channel slicing ``[:, :3]`` becomes ``[..., :3]`` here.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pil_gray_u8(rgb_u8: jax.Array) -> jax.Array:
    """PIL ``Image.convert('L')`` bit-exactly, on device: libImaging's
    integer formula ``L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16``
    (verified element-equal to PIL over random uint8 images).

    rgb_u8: [..., 3] uint8 -> [...] int32 grayscale in [0, 255].
    """
    r = rgb_u8[..., 0].astype(jnp.int32)
    g = rgb_u8[..., 1].astype(jnp.int32)
    b = rgb_u8[..., 2].astype(jnp.int32)
    return (r * 19595 + g * 38470 + b * 7471 + 32768) >> 16


def append_contour_mask_u8(img: jax.Array) -> jax.Array:
    """Append the reference's 4th contour-mask channel ON DEVICE.

    Bit-identical to the host collate's mask (dataset/dataset.py:644-652 via
    data/transforms.resize_normalize(as_uint8=True, mask=True)): grayscale
    (PIL 'L', exact integer math) thresholded at its own mean — computed as
    ``gray * (H*W) > sum(gray)`` so the comparison is EXACT integer
    arithmetic (a float mean could flip pixels where gray == mean).
    Rationale: the mask is a deterministic function of the RGB wire, so
    shipping it costs 25% extra host->device bandwidth for nothing — on a
    tunneled TPU the chunked train wire is transfer-bound (docs/
    perf_notes.md).

    img: [..., H, W, 3] uint8 -> [..., H, W, 4] uint8 (mask in {0, 255};
    the steps' /255 normalization then yields the {0, 1} float mask).
    """
    gray = pil_gray_u8(img)
    hw = gray.shape[-1] * gray.shape[-2]
    total = jnp.sum(gray, axis=(-1, -2), keepdims=True)
    m = jnp.where(gray * hw > total, 0, 255).astype(jnp.uint8)
    return jnp.concatenate([img, m[..., None]], axis=-1)


def rgb_to_gray(x: jax.Array) -> jax.Array:
    """NHWC RGB -> NHW1 grayscale with BT.601 weights (base.py:825-828)."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def calculate_psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """PSNR over the first 3 channels; inputs in [0,1] (ssim_psnr.py:9-15)."""
    a = img1[..., :3] * 255.0
    b = img2[..., :3] * 255.0
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g = g / g.sum()
    return np.outer(g, g)


def _depthwise_same_conv(x: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2D conv with torch-style zero 'same' padding, NHWC."""
    c = x.shape[-1]
    k = window.shape[0]
    # [kh, kw, in_ch_per_group=1, c] depthwise kernel
    kern = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, c))
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@partial(jax.jit, static_argnames=("size_average", "window_size"))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
) -> jax.Array:
    """SSIM over first 3 channels, NHWC (ssim_psnr.py:30-78).

    Matches the reference's zero-padded 'same' depthwise convolution (torch
    F.conv2d with padding=window_size//2), including the border bias.
    """
    img1 = img1[..., :3]
    img2 = img2[..., :3]
    window = jnp.asarray(_gaussian_window(window_size), img1.dtype)

    mu1 = _depthwise_same_conv(img1, window)
    mu2 = _depthwise_same_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_same_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_same_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_same_conv(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    # per-sample mean over H, W, C (reference: .mean(1).mean(1).mean(1))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def gradient_map(x: jax.Array) -> jax.Array:
    """Central-difference gradient magnitude map, NHWC (image_loss.py:43-51).

    Reference pads by one pixel and shifts, so borders use one-sided halves.
    """
    r = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    l = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, : x.shape[2], :]
    t = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, : x.shape[1], :, :]
    b = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:, :, :]
    return jnp.sqrt(((r - l) * 0.5) ** 2 + ((t - b) * 0.5) ** 2 + 1e-6)
