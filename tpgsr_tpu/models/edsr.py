"""EDSR (model/edsr.py:35-90).

256-channel trunk with 32 residual blocks (0.1 residual scaling),
MeanShift in/out (identity 1x1 conv with frozen ±rgb_mean bias — implemented
as plain arithmetic since it is frozen), PixelShuffle upsampling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import pixel_shuffle

RGB_MEAN = (0.4488, 0.4371, 0.4040)


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


class _ResBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        out = nn.relu(_msra_conv(256, "conv1")(x))
        out = _msra_conv(256, "conv2")(out)
        return out * 0.1 + x


class EDSR(nn.Module):
    scale_factor: int = 2
    n_resblocks: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mean = jnp.asarray(RGB_MEAN, x.dtype)
        out = x - mean
        out = _msra_conv(256, "conv_input")(out)
        residual = out
        for i in range(self.n_resblocks):
            out = _ResBlock(name=f"res{i}")(out)
        out = _msra_conv(256, "conv_mid")(out)
        out = out + residual
        for j in range(int(math.log2(self.scale_factor))):
            out = _msra_conv(256 * 4, f"up{j}")(out)
            out = pixel_shuffle(out, 2)
        out = _msra_conv(3, "conv_output")(out)
        return out + mean
