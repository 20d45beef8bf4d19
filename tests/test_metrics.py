"""PSNR/SSIM/gradient-map parity vs a torch reimplementation of the
reference formulas (utils/ssim_psnr.py, loss/image_loss.py)."""

import math

import numpy as np
import torch
import torch.nn.functional as F

from tpgsr_tpu.ops.image import calculate_psnr, gradient_map, rgb_to_gray, ssim


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    # independent reimplementation of utils/ssim_psnr.py for testing
    g = torch.tensor([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2d = (g @ g.t()).float()[None, None]
    c = img1.shape[1]
    window = w2d.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=c)
    mu2 = F.conv2d(img2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=c) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()


def test_psnr(rng):
    a = rng.random((2, 32, 128, 4), dtype=np.float32)
    b = rng.random((2, 32, 128, 4), dtype=np.float32)
    ours = float(calculate_psnr(a, b))
    mse = np.mean((a[..., :3] * 255 - b[..., :3] * 255) ** 2)
    ref = 20 * np.log10(255.0 / np.sqrt(mse))
    assert abs(ours - ref) < 1e-3


def test_ssim_vs_torch(rng):
    a = rng.random((2, 32, 128, 3), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(a, b))
    ref = float(
        _torch_ssim(
            torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(b, (0, 3, 1, 2))),
        )
    )
    assert abs(ours - ref) < 1e-5


def test_gradient_map_vs_torch(rng):
    x = rng.random((2, 16, 64, 3), dtype=np.float32)
    ours = np.asarray(gradient_map(x))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    h, w = xt.shape[2], xt.shape[3]
    r = F.pad(xt, (0, 1, 0, 0))[:, :, :, 1:]
    l = F.pad(xt, (1, 0, 0, 0))[:, :, :, :w]
    t = F.pad(xt, (0, 0, 1, 0))[:, :, :h, :]
    b = F.pad(xt, (0, 0, 0, 1))[:, :, 1:, :]
    ref = torch.sqrt(((r - l) * 0.5) ** 2 + ((t - b) * 0.5) ** 2 + 1e-6)
    np.testing.assert_allclose(ours, np.transpose(ref.numpy(), (0, 2, 3, 1)), atol=1e-6)


def test_rgb_to_gray(rng):
    x = rng.random((1, 4, 4, 3), dtype=np.float32)
    ours = np.asarray(rgb_to_gray(x))
    ref = 0.299 * x[..., :1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    np.testing.assert_allclose(ours, ref, atol=1e-7)
