"""RDN and RDN_TL (model/rdn.py:54-214).

Residual Dense Network: 3 RDBs (6 dense layers each, growth 32), global
feature fusion, PixelShuffle upsample.  RDN takes 3-channel input (no mask).
The TL variant concatenates the prior before each RDB's 1x1 fusion conv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchConv, pixel_shuffle
from tpgsr_tpu.models.prior import NP_PADDINGS, InfoGenP
from tpgsr_tpu.ops.resize import interpolate_bilinear


class _DenseLayer(nn.Module):
    growth: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(
            TorchConv(self.growth, (3, 3), padding=(1, 1), use_bias=False, name="conv")(x)
        )
        return jnp.concatenate([x, out], axis=-1)


class RDB(nn.Module):
    n_channels: int
    n_dense: int = 6
    growth: int = 32
    text_channels: int = 0  # >0 => TL fusion before the 1x1 conv

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None):
        out = x
        for i in range(self.n_dense):
            out = _DenseLayer(self.growth, name=f"dense{i}")(out)
        if self.text_channels:
            out = jnp.concatenate([out, text_emb], axis=-1)
        out = TorchConv(self.n_channels, (1, 1), use_bias=False, name="conv_1x1")(out)
        return out + x


class RDN(nn.Module):
    n_channel: int = 3
    n_dense: int = 6
    n_feat: int = 64
    scale_factor: int = 2
    growth: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f_m1 = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="conv1")(x)
        f_0 = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="conv2")(f_m1)
        f_1 = RDB(self.n_feat, self.n_dense, self.growth, name="RDB1")(f_0)
        f_2 = RDB(self.n_feat, self.n_dense, self.growth, name="RDB2")(f_1)
        f_3 = RDB(self.n_feat, self.n_dense, self.growth, name="RDB3")(f_2)
        ff = jnp.concatenate([f_1, f_2, f_3], axis=-1)
        fd = TorchConv(self.n_feat, (1, 1), name="GFF_1x1")(ff)
        fg = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="GFF_3x3")(fd)
        fdf = fg + f_m1
        us = TorchConv(self.n_feat * self.scale_factor**2, (3, 3), padding=(1, 1), name="conv_up")(fdf)
        us = pixel_shuffle(us, self.scale_factor)
        return TorchConv(self.n_channel, (3, 3), padding=(1, 1), name="conv3")(us)


class RDN_TL(nn.Module):
    n_channel: int = 4
    n_dense: int = 6
    n_feat: int = 64
    scale_factor: int = 2
    growth: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None, train: bool = True):
        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        t = InfoGenP(self.text_emb, self.out_text_channels, NP_PADDINGS, name="infoGen")(
            text_emb, train=train
        )
        t = interpolate_bilinear(t, (x.shape[1], x.shape[2]), align_corners=True)

        f_m1 = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="conv1")(x)
        f_0 = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="conv2")(f_m1)
        f_1 = RDB(self.n_feat, self.n_dense, self.growth, self.out_text_channels, name="RDB1")(f_0, t)
        f_2 = RDB(self.n_feat, self.n_dense, self.growth, self.out_text_channels, name="RDB2")(f_1, t)
        f_3 = RDB(self.n_feat, self.n_dense, self.growth, self.out_text_channels, name="RDB3")(f_2, t)
        ff = jnp.concatenate([f_1, f_2, f_3], axis=-1)
        fd = TorchConv(self.n_feat, (1, 1), name="GFF_1x1")(ff)
        fg = TorchConv(self.n_feat, (3, 3), padding=(1, 1), name="GFF_3x3")(fd)
        fdf = fg + f_m1
        us = TorchConv(self.n_feat * self.scale_factor**2, (3, 3), padding=(1, 1), name="conv_up")(fdf)
        us = pixel_shuffle(us, self.scale_factor)
        return TorchConv(self.n_channel, (3, 3), padding=(1, 1), name="conv3")(us)
