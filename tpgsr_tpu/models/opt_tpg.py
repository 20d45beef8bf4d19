"""The "OPT" TPG — clova's configurable recognizer in its TPGSR configuration
None-ResNet-None-CTC (main.py:60-75).

Parity targets (model/crnn/):
  * ``Model``: model.py:25-95 — Trans(None) -> ResNet feature extractor ->
    AdaptiveAvgPool over height -> (no BiLSTM) -> Linear CTC head; output
    permuted to the reference's [T, B, C].
  * ``ResNet_FeatureExtractor`` (FAN): modules/feature_extraction.py:54-246
    — conv stem (oc/16 -> oc/8), 4 BasicBlock stages [1,2,5,3] with interleaved
    conv-BN and maxpools (2,2 / 2,2 / (2,1)+pad(0,1)), then conv k2 s(2,1)
    p(0,1) and conv k2 s1 p0 to [B, 512, 1, W/4+1].

Interface-compatible with ``CRNN``: [B, 32, W, 1] gray in -> [T, B, nclass]
logits, so it drops into the TPG slot (``--tpg=OPT``) everywhere CRNN does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, TorchConv


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN (+1x1 downsample) (feature_extraction.py:117-150)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                        use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(self.planes, (1, 1), (self.stride, self.stride),
                                 use_bias=False, name="down_conv")(x)
            residual = BatchNorm(name="down_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class ResNetFAN(nn.Module):
    """FAN ResNet, layers [1,2,5,3] (feature_extraction.py:153-246)."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        blocks = [oc // 4, oc // 2, oc, oc]
        layers = [1, 2, 5, 3]

        def conv_bn(v, ch, k, s, p, name):
            v = TorchConv(ch, (k, k), (s, s) if isinstance(s, int) else s,
                          (p, p) if isinstance(p, int) else p, use_bias=False,
                          name=f"{name}_conv")(v)
            return BatchNorm(name=f"{name}_bn")(v, use_running_average=not train)

        x = nn.relu(conv_bn(x, oc // 16, 3, 1, 1, "conv0_1"))
        x = nn.relu(conv_bn(x, oc // 8, 3, 1, 1, "conv0_2"))

        inplanes = oc // 8
        for si, (planes, n) in enumerate(zip(blocks, layers), start=1):
            if si == 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
            elif si == 2:
                x = nn.max_pool(x, (2, 2), (2, 2))
            elif si == 3:
                x = nn.max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))
            x = BasicBlock(planes, downsample=(inplanes != planes),
                           name=f"layer{si}_0")(x, train=train)
            inplanes = planes
            for bi in range(1, n):
                x = BasicBlock(planes, name=f"layer{si}_{bi}")(x, train=train)
            if si < 4:
                x = nn.relu(conv_bn(x, planes, 3, 1, 1, f"conv{si}"))

        # conv4_1: k2 s(2,1) p(0,1); conv4_2: k2 s1 p0
        x = TorchConv(oc, (2, 2), (2, 1), (0, 1), use_bias=False, name="conv4_1_conv")(x)
        x = BatchNorm(name="conv4_1_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchConv(oc, (2, 2), (1, 1), (0, 0), use_bias=False, name="conv4_2_conv")(x)
        x = BatchNorm(name="conv4_2_bn")(x, use_running_average=not train)
        return nn.relu(x)


class OPTModel(nn.Module):
    """None-ResNet-None-CTC; CRNN-interface-compatible TPG."""

    nclass: int = 37
    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNetFAN(self.output_channel, name="FeatureExtraction")(x, train=train)
        # AdaptiveAvgPool2d((None, 1)) after permute [b,c,h,w]->[b,w,c,h]:
        # average over the (height) axis -> [B, W', C]
        feat = jnp.mean(feat, axis=1)
        logits = nn.Dense(
            self.nclass,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            name="Prediction",
        )(feat)
        return jnp.transpose(logits, (1, 0, 2))  # [T, B, C]
