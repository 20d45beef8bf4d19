"""SRCNN and SRCNN_TL (model/srcnn.py:109-146, 50-107).

Pre-upsample design: input is nearest-upsampled x2 (or STN/TPS-rectified to
HR size) before 3 convs; the TL variant concatenates the spatial text prior
before every conv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchConv
from tpgsr_tpu.models.prior import NP_PADDINGS, InfoGenP
from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer
from tpgsr_tpu.ops.resize import interpolate_bilinear


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """torch F.interpolate(scale_factor=f, mode='nearest') for NHWC."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class SRCNN(nn.Module):
    scale_factor: int = 2
    in_planes: int = 3
    stn: bool = False
    height: int = 32
    width: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.stn:
            # NB: reference applies STN in eval too (srcnn.py:139-141) and the
            # TPS output size is the HR size, i.e. TPS performs the upsample.
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer((self.height, self.width))
            x, _ = tps(x, ctrl)
        else:
            x = upsample_nearest(x, self.scale_factor)
        x = nn.relu(TorchConv(64, (9, 9), padding=(4, 4), name="conv1")(x))
        x = nn.relu(TorchConv(32, (1, 1), name="conv2")(x))
        return TorchConv(self.in_planes, (5, 5), padding=(2, 2), name="conv3")(x)


class SRCNN_TL(nn.Module):
    scale_factor: int = 2
    in_planes: int = 4
    stn: bool = False
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None, train: bool = True):
        if self.stn:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer((self.height, self.width))
            x, _ = tps(x, ctrl)
        else:
            x = upsample_nearest(x, self.scale_factor)

        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        t = InfoGenP(self.text_emb, self.out_text_channels, NP_PADDINGS, name="infoGen")(
            text_emb, train=train
        )
        t = interpolate_bilinear(t, (x.shape[1], x.shape[2]), align_corners=True)

        out = jnp.concatenate([x, t], axis=-1)
        out = nn.relu(TorchConv(64, (9, 9), padding=(4, 4), name="conv1")(out))
        out = jnp.concatenate([out, t], axis=-1)
        out = nn.relu(TorchConv(32, (1, 1), name="conv2")(out))
        out = jnp.concatenate([out, t], axis=-1)
        return TorchConv(self.in_planes, (5, 5), padding=(2, 2), name="conv3")(out)
