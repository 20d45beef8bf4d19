"""VDSR and VDSR_TL (model/vdsr.py:39-233).

Pre-upsampled (nearest x2) residual CNN with 6 conv-ReLU blocks, each with
its own skip; MSRA-normal init.  The reference hardcodes ``self.stn = False``
(vdsr.py:56,181) so STN is never active for VDSR.  The TL variant
concatenates the prior before every block conv.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.prior import NP_PADDINGS, InfoGenP
from tpgsr_tpu.models.srcnn import upsample_nearest
from tpgsr_tpu.ops.resize import interpolate_bilinear


def _msra_conv(features: int, name: str, use_bias: bool = False):
    """conv3x3 with normal(0, sqrt(2/(k*k*out))) weights (vdsr.py:47-51)."""

    class _C(nn.Module):
        @nn.compact
        def __call__(self, x):
            k = self.param(
                "kernel",
                lambda key, s: jax.random.normal(key, s) * math.sqrt(2.0 / (9 * features)),
                (3, 3, x.shape[-1], features),
            )
            y = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y

    return _C(name=name)


class VDSR(nn.Module):
    scale_factor: int = 2
    in_planes: int = 3
    n_blocks: int = 6

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample_nearest(x, self.scale_factor)
        residual = x
        out = nn.relu(_msra_conv(64, "input")(x))
        for i in range(self.n_blocks):
            out = nn.relu(_msra_conv(64, f"block{i + 1}")(out)) + out
        out = _msra_conv(self.in_planes, "output")(out)
        return out + residual


class VDSR_TL(nn.Module):
    scale_factor: int = 2
    in_planes: int = 4
    n_blocks: int = 6
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None, train: bool = True):
        x = upsample_nearest(x, self.scale_factor)
        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        t = InfoGenP(self.text_emb, self.out_text_channels, NP_PADDINGS, name="infoGen")(
            text_emb, train=train
        )
        # reference resizes the prior to tps_outputsize == (height, width)
        t = interpolate_bilinear(t, (self.height, self.width), align_corners=True)

        residual = x
        out = nn.relu(_msra_conv(64, "input")(x))
        for i in range(self.n_blocks):
            cat = jnp.concatenate([out, t], axis=-1)
            out = nn.relu(_msra_conv(64, f"block{i + 1}")(cat)) + out
        out = _msra_conv(self.in_planes, "output")(out)
        return out + residual
