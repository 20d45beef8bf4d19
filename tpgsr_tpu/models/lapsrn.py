"""LapSRN (model/lapsrn.py:57-137).

Laplacian pyramid SR: 10x conv-LeakyReLU feature branch with a learned x2
deconv, plus an image branch deconv; outputs HR_2x (or HR_4x for scale 4).
ConvTranspose weights init to a bilinear upsampling filter replicated over
ALL channel pairs, mirroring the reference (lapsrn.py:79-84).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer


def bilinear_upsample_filter(size: int) -> np.ndarray:
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    return ((1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)).astype(
        np.float32
    )


def _msra_conv(features: int, name: str):
    class _C(nn.Module):
        @nn.compact
        def __call__(self, x):
            k = self.param(
                "kernel",
                lambda key, s: jax.random.normal(key, s) * math.sqrt(2.0 / (9 * features)),
                (3, 3, x.shape[-1], features),
            )
            return jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

    return _C(name=name)


class _BilinearDeconv(nn.Module):
    """ConvTranspose2d(k4, s2, p1, bias=False) with dense bilinear init."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        filt = bilinear_upsample_filter(4)

        def init(key, shape):
            # reference repeats the same filter over all (in, out) pairs
            return jnp.broadcast_to(jnp.asarray(filt)[:, :, None, None], shape)

        kernel = self.param("kernel", init, (4, 4, in_ch, self.features))
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _ConvBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(10):
            x = nn.leaky_relu(_msra_conv(64, f"conv{i}")(x), 0.2)
        x = _BilinearDeconv(64, name="deconv")(x)
        return nn.leaky_relu(x, 0.2)


class LapSRN(nn.Module):
    scale_factor: int = 2
    in_planes: int = 3
    stn: bool = False
    width: int = 128
    height: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)
        out = nn.leaky_relu(_msra_conv(64, "conv_input")(x), 0.2)
        f1 = _ConvBlock(name="convt_F1")(out)
        i1 = _BilinearDeconv(self.in_planes, name="convt_I1")(x)
        r1 = _msra_conv(self.in_planes, "convt_R1")(f1)
        hr2x = i1 + r1
        if self.scale_factor == 2:
            return hr2x
        f2 = _ConvBlock(name="convt_F2")(f1)
        i2 = _BilinearDeconv(self.in_planes, name="convt_I2")(hr2x)
        r2 = _msra_conv(self.in_planes, "convt_R2")(f2)
        return i2 + r2
