"""SRResNet and SRResNet_TL (model/srresnet.py:13-235).

5 residual blocks (conv-BN-PReLU-conv-BN), skip from block1, PixelShuffle
upsampling with PReLU, tanh output.  The TL variant concatenates the prior
between the two convs of each residual block.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, PReLU, TorchConv, pixel_shuffle
from tpgsr_tpu.models.prior import NP_PADDINGS, InfoGenP
from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer
from tpgsr_tpu.ops.resize import interpolate_bilinear


class ResidualBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        r = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv1")(x)
        r = BatchNorm(name="bn1")(r, use_running_average=not train)
        r = PReLU(name="prelu")(r)
        r = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv2")(r)
        r = BatchNorm(name="bn2")(r, use_running_average=not train)
        return x + r


class ResidualBlockTL(nn.Module):
    channels: int
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb, train: bool = True):
        r = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv1")(x)
        r = BatchNorm(name="bn1")(r, use_running_average=not train)
        r = PReLU(name="prelu")(r)
        r = jnp.concatenate([r, text_emb], axis=-1)
        r = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv2")(r)
        r = BatchNorm(name="bn2")(r, use_running_average=not train)
        return x + r


class _UpsamplePReLU(nn.Module):
    in_channels: int
    up_scale: int = 2

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.in_channels * self.up_scale**2, (3, 3), padding=(1, 1), name="conv")(x)
        x = pixel_shuffle(x, self.up_scale)
        return PReLU(name="prelu")(x)


class SRResNet(nn.Module):
    scale_factor: int = 2
    stn: bool = False
    width: int = 128
    height: int = 32
    mask: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)
        b1 = PReLU(name="block1_prelu")(
            TorchConv(64, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        b = b1
        for i in range(2, 7):
            b = ResidualBlock(64, name=f"block{i}")(b, train=train)
        b = TorchConv(64, (3, 3), padding=(1, 1), name="block7_conv")(b)
        b = BatchNorm(name="block7_bn")(b, use_running_average=not train)
        b = b1 + b
        for j in range(int(math.log2(self.scale_factor))):
            b = _UpsamplePReLU(64, 2, name=f"block8_up{j}")(b)
        b = TorchConv(in_planes, (9, 9), padding=(4, 4), name="block8_conv")(b)
        return jnp.tanh(b)


class SRResNet_TL(nn.Module):
    scale_factor: int = 2
    stn: bool = False
    width: int = 128
    height: int = 32
    mask: bool = False
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None, train: bool = True):
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)
        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        t = InfoGenP(self.text_emb, self.out_text_channels, NP_PADDINGS, name="infoGen")(
            text_emb, train=train
        )
        t = interpolate_bilinear(t, (x.shape[1], x.shape[2]), align_corners=True)

        b1 = PReLU(name="block1_prelu")(
            TorchConv(64, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        b = b1
        for i in range(2, 7):
            b = ResidualBlockTL(64, self.out_text_channels, name=f"block{i}")(b, t, train=train)
        b = TorchConv(64, (3, 3), padding=(1, 1), name="block7_conv")(b)
        b = BatchNorm(name="block7_bn")(b, use_running_average=not train)
        b = b1 + b
        for j in range(int(math.log2(self.scale_factor))):
            b = _UpsamplePReLU(64, 2, name=f"block8_up{j}")(b)
        b = TorchConv(in_planes, (9, 9), padding=(4, 4), name="block8_conv")(b)
        return jnp.tanh(b)


class Discriminator(nn.Module):
    """SRGAN discriminator (model/srresnet.py:237-280; unused in the main
    TPGSR path, provided for the adversarial ablations)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        cfg = [(64, 1, False), (64, 2, True), (128, 1, True), (128, 2, True),
               (256, 1, True), (256, 2, True), (512, 1, True), (512, 2, True)]
        for i, (ch, s, bn) in enumerate(cfg):
            x = TorchConv(ch, (3, 3), (s, s), (1, 1), name=f"conv{i}")(x)
            if bn:
                x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = lrelu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        x = lrelu(TorchConv(1024, (1, 1), name="fc1")(x))
        x = TorchConv(1, (1, 1), name="fc2")(x)
        return jax.nn.sigmoid(x[:, 0, 0, 0])
