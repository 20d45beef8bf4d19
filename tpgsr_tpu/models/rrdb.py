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
