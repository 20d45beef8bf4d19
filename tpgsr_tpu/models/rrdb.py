"""RRDBNet (ESRGAN generator; model/esrgan.py:16-90, model/rrdb.py:163).

23 Residual-in-Residual Dense Blocks with 0.2 scaling, nearest-upsample
conv head, LeakyReLU(0.2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchConv
from tpgsr_tpu.models.srcnn import upsample_nearest


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x1 = lrelu(TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv1")(x))
        x2 = lrelu(
            TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv2")(
                jnp.concatenate([x, x1], -1)
            )
        )
        x3 = lrelu(
            TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv3")(
                jnp.concatenate([x, x1, x2], -1)
            )
        )
        x4 = lrelu(
            TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv4")(
                jnp.concatenate([x, x1, x2, x3], -1)
            )
        )
        x5 = TorchConv(self.nf, (3, 3), padding=(1, 1), name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1)
        )
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    scale_factor: int = 2
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = TorchConv(self.nf, (3, 3), padding=(1, 1), name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, name=f"RRDB{i}")(trunk)
        trunk = TorchConv(self.nf, (3, 3), padding=(1, 1), name="trunk_conv")(trunk)
        fea = fea + trunk
        for j in range(int(math.log2(self.scale_factor))):
            fea = lrelu(
                TorchConv(self.nf, (3, 3), padding=(1, 1), name=f"upconv{j + 1}")(
                    upsample_nearest(fea, 2)
                )
            )
        out = lrelu(TorchConv(self.nf, (3, 3), padding=(1, 1), name="HRconv")(fea))
        return TorchConv(self.out_nc, (3, 3), padding=(1, 1), name="conv_last")(out)


class ResidualDenseBlock5C_TL(nn.Module):
    """RDB with text-prior concat before conv5, scale 0.166
    (model/rrdb.py:70-93)."""

    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x, text_emb):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x1 = lrelu(TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv1")(x))
        x2 = lrelu(TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv2")(
            jnp.concatenate([x, x1], -1)))
        x3 = lrelu(TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv3")(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(TorchConv(self.gc, (3, 3), padding=(1, 1), name="conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = TorchConv(self.nf, (3, 3), padding=(1, 1), name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4, text_emb], -1))
        return x5 * 0.166 + x


class RRDB_TL(nn.Module):
    """Residual-in-residual TL block (model/rrdb.py:96-127)."""

    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x, text_emb):
        out = ResidualDenseBlock5C_TL(self.nf, self.gc, name="RDB1")(x, text_emb)
        out = ResidualDenseBlock5C_TL(self.nf, self.gc, name="RDB2")(out, text_emb)
        out = ResidualDenseBlock5C_TL(self.nf, self.gc, name="RDB3")(out, text_emb)
        return out * 0.2 + x


class RRDBNet_TL(nn.Module):
    """RRDBNet with text-prior fusion in every RDB (model/rrdb.py:131-160).

    The reference passes an already-spatial ``text_emb`` through the trunk;
    here the [B,1,T,n_classes] prior is lifted by InfoGen (rrdb.py:15-44)
    and bilinearly resized to the feature map, matching the other TL archs.
    Reference upsamples x8 (3 upconvs); we scale by ``scale_factor``.
    """

    scale_factor: int = 2
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb=None, train: bool = True):
        from tpgsr_tpu.models.tsrn import InfoGen
        from tpgsr_tpu.ops.resize import interpolate_bilinear

        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        spatial = InfoGen(self.text_emb, self.out_text_channels, name="infoGen")(
            text_emb, train=train
        )
        spatial = interpolate_bilinear(spatial, (x.shape[1], x.shape[2]), align_corners=True)

        fea = TorchConv(self.nf, (3, 3), padding=(1, 1), name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB_TL(self.nf, self.gc, name=f"RRDB{i}")(trunk, spatial)
        trunk = TorchConv(self.nf, (3, 3), padding=(1, 1), name="trunk_conv")(trunk)
        fea = fea + trunk
        for j in range(int(math.log2(self.scale_factor))):
            fea = lrelu(
                TorchConv(self.nf, (3, 3), padding=(1, 1), name=f"upconv{j + 1}")(
                    upsample_nearest(fea, 2)
                )
            )
        out = lrelu(TorchConv(self.nf, (3, 3), padding=(1, 1), name="HRconv")(fea))
        return TorchConv(self.out_nc, (3, 3), padding=(1, 1), name="conv_last")(out)
