"""TSRN and TSRN_TL (text-prior fused) SR backbones.

Parity targets (model/tsrn.py):
  * ``TSRN``: :18-78 — 9x9 entry conv + PReLU, srb_nums recurrent residual
    blocks (conv-BN-mish-conv-BN + vertical/horizontal BiGRU sweeps),
    conv-BN with skip from block1, PixelShuffle upsampling, 9x9 out conv,
    tanh.  STN/TPS applied only in training mode (:63).
  * ``InfoGen``: :81-108 — 4x ConvTranspose2d+BN+ReLU pyramid lifting the
    [B,37,1,T] text prior to a 32-channel spatial map.
  * ``TSRN_TL``: :111-215 — same trunk, each SRB concatenates the (bilinearly
    resized, align_corners=True) prior map before its first GRU (:397-426);
    zero prior when none is given (:191-193).

Layout: NHWC.  The prior enters as [B, 1, T, n_classes] (reference's
[B, C=37, 1, T] moved to channel-last).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import (
    BatchNorm,
    ConvParams,
    GruBlock,
    PReLU,
    TorchConv,
    TorchConvTranspose,
    UpsampleBlock,
    fused_sr_head,
    mish,
)
from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer
from tpgsr_tpu.ops.resize import interpolate_bilinear


class RecurrentResidualBlock(nn.Module):
    """conv-BN-mish-conv-BN -> vertical BiGRU; then horizontal BiGRU on
    x + residual (model/tsrn.py:373-394)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv1")(x)
        residual = BatchNorm(name="bn1")(residual, use_running_average=not train)
        residual = mish(residual)
        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv2")(residual)
        residual = BatchNorm(name="bn2")(residual, use_running_average=not train)
        # gru1 over the vertical axis: swap H/W, run row GRU, swap back.
        # (A transpose-free NHWC-vertical kernel exists — GruBlock(axis=1) —
        # and wins in isolation, but measured ~20% slower in the full model:
        # XLA fuses these transposes into the surrounding convs for free.)
        residual = jnp.transpose(residual, (0, 2, 1, 3))
        residual = GruBlock(self.channels, name="gru1")(residual)
        residual = jnp.transpose(residual, (0, 2, 1, 3))
        return GruBlock(self.channels, name="gru2")(x + residual)


class RecurrentResidualBlockTL(nn.Module):
    """SRB with text-prior concat before the vertical GRU (tsrn.py:397-426)."""

    channels: int
    text_channels: int

    @nn.compact
    def __call__(self, x, text_emb, train: bool = True):
        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv1")(x)
        residual = BatchNorm(name="bn1")(residual, use_running_average=not train)
        residual = mish(residual)
        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv2")(residual)
        residual = BatchNorm(name="bn2")(residual, use_running_average=not train)
        cat = jnp.concatenate([residual, text_emb], axis=-1)
        cat = jnp.transpose(cat, (0, 2, 1, 3))
        residual = GruBlock(self.channels, name="gru1")(cat)
        residual = jnp.transpose(residual, (0, 2, 1, 3))
        return GruBlock(self.channels, name="gru2")(x + residual)


class InfoGen(nn.Module):
    """Lift the [B,1,T,t_emb] prior to a spatial map (tsrn.py:81-108)."""

    t_emb: int
    output_size: int

    @nn.compact
    def __call__(self, t_embedding, train: bool = True):
        x = TorchConvTranspose(512, (3, 3), (2, 2), padding=(1, 1), use_bias=False, name="tconv1")(
            t_embedding
        )
        x = nn.relu(BatchNorm(name="bn1")(x, use_running_average=not train))
        x = TorchConvTranspose(128, (3, 3), (2, 2), padding=(1, 1), use_bias=False, name="tconv2")(x)
        x = nn.relu(BatchNorm(name="bn2")(x, use_running_average=not train))
        x = TorchConvTranspose(64, (3, 3), (2, 2), padding=(1, 1), use_bias=False, name="tconv3")(x)
        x = nn.relu(BatchNorm(name="bn3")(x, use_running_average=not train))
        x = TorchConvTranspose(
            self.output_size, (3, 3), (2, 1), padding=(1, 0), use_bias=False, name="tconv4"
        )(x)
        x = nn.relu(BatchNorm(name="bn4")(x, use_running_average=not train))
        return x


class TSRN(nn.Module):
    """Baseline TSRN (no text prior)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        upsample_block_num = int(math.log2(self.scale_factor))

        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)

        block1 = TorchConv(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        block1 = PReLU(name="block1_prelu")(block1)

        b = block1
        for i in range(self.srb_nums):
            b = RecurrentResidualBlock(ch, name=f"block{i + 2}")(b, train=train)

        b = TorchConv(ch, (3, 3), padding=(1, 1), name=f"block{self.srb_nums + 2}_conv")(b)
        b = BatchNorm(name=f"block{self.srb_nums + 2}_bn")(b, use_running_average=not train)

        b = block1 + b
        # fused head: the last UpsampleBlock's shuffle+mish and the 9x9 out
        # conv collapse into one exactly-equivalent 5x5 conv at LR scale
        # (layers.fused_sr_head) — the HR-layout 9x9 conv was the hottest op
        for j in range(upsample_block_num - 1):
            b = UpsampleBlock(ch, 2, name=f"block{self.srb_nums + 3}_up{j}")(b)
        g = UpsampleBlock(
            ch, 2, apply_shuffle=False,
            name=f"block{self.srb_nums + 3}_up{upsample_block_num - 1}",
        )(b)
        k9, b9 = ConvParams(
            in_planes, (9, 9), ch, name=f"block{self.srb_nums + 3}_conv"
        )()
        b = fused_sr_head(g, None, k9, b9)
        return jnp.tanh(b)


class TSRN_TL(nn.Module):
    """TSRN with text-prior fusion (archs tsrn_tl / tsrn_tl_wmask /
    tsrn_tl_cascade — same module; trainer behavior differs)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x, text_emb: Optional[jax.Array] = None, train: bool = True):
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        upsample_block_num = int(math.log2(self.scale_factor))

        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)

        block1 = TorchConv(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        block1 = PReLU(name="block1_prelu")(block1)

        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)

        spatial_t_emb = InfoGen(self.text_emb, self.out_text_channels, name="infoGen")(
            text_emb, train=train
        )
        spatial_t_emb = interpolate_bilinear(
            spatial_t_emb, (x.shape[1], x.shape[2]), align_corners=True
        )

        b = block1
        for i in range(self.srb_nums):
            # reference fuses the prior in SRBs 2..6 only (tsrn.py:200-209)
            if i + 2 in (2, 3, 4, 5, 6):
                b = RecurrentResidualBlockTL(ch, self.out_text_channels, name=f"block{i + 2}")(
                    b, spatial_t_emb, train=train
                )
            else:
                b = RecurrentResidualBlock(ch, name=f"block{i + 2}")(b, train=train)

        b = TorchConv(ch, (3, 3), padding=(1, 1), name=f"block{self.srb_nums + 2}_conv")(b)
        b = BatchNorm(name=f"block{self.srb_nums + 2}_bn")(b, use_running_average=not train)

        b = block1 + b
        # fused head: the last UpsampleBlock's shuffle+mish and the 9x9 out
        # conv collapse into one exactly-equivalent 5x5 conv at LR scale
        # (layers.fused_sr_head) — the HR-layout 9x9 conv was the hottest op
        for j in range(upsample_block_num - 1):
            b = UpsampleBlock(ch, 2, name=f"block{self.srb_nums + 3}_up{j}")(b)
        g = UpsampleBlock(
            ch, 2, apply_shuffle=False,
            name=f"block{self.srb_nums + 3}_up{upsample_block_num - 1}",
        )(b)
        k9, b9 = ConvParams(
            in_planes, (9, 9), ch, name=f"block{self.srb_nums + 3}_conv"
        )()
        b = fused_sr_head(g, None, k9, b9)
        return jnp.tanh(b)


class TSRN_C2F(nn.Module):
    """Coarse-to-fine TSRN (model/tsrn.py:218-283): plain SRB trunk, a
    coarse projection at LR scale, upsample head over [trunk+skip, coarse]."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        upsample_block_num = int(math.log2(self.scale_factor))

        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)

        block1 = TorchConv(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        block1 = PReLU(name="block1_prelu")(block1)

        b = block1
        for i in range(self.srb_nums):
            b = RecurrentResidualBlock(ch, name=f"block{i + 2}")(b, train=train)
        b = TorchConv(ch, (3, 3), padding=(1, 1), name=f"block{self.srb_nums + 2}_conv")(b)
        b = BatchNorm(name=f"block{self.srb_nums + 2}_bn")(b, use_running_average=not train)

        proj_coarse = TorchConv(in_planes, (9, 9), padding=(4, 4), name="coarse_proj")(b)

        h = jnp.concatenate([block1 + b, proj_coarse], axis=-1)
        for j in range(upsample_block_num):
            h = UpsampleBlock(ch + in_planes, 2, name=f"block{self.srb_nums + 3}_up{j}")(h)
        h = TorchConv(in_planes, (9, 9), padding=(4, 4), name=f"block{self.srb_nums + 3}_conv")(h)
        return jnp.tanh(h), proj_coarse


class ReasoningResidualBlock(nn.Module):
    """conv-BN-mish-conv-BN -> FeatureEnhancer self-attention over H*W
    (model/tsrn.py:430-461)."""

    channels: int

    @nn.compact
    def __call__(self, x, word_vecs=None, train: bool = True):
        from tpgsr_tpu.models.transformer import FeatureEnhancerW2V

        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv1")(x)
        residual = BatchNorm(name="bn1")(residual, use_running_average=not train)
        residual = mish(residual)
        residual = TorchConv(self.channels, (3, 3), padding=(1, 1), name="conv2")(residual)
        residual = BatchNorm(name="bn2")(residual, use_running_average=not train)

        b, h, w, c = residual.shape
        flat = jnp.transpose(residual, (0, 3, 1, 2)).reshape(b, c, h * w)
        flat = FeatureEnhancerW2V(
            vec_d=300, feature_size=self.channels, head_num=4, name="feature_enhancer"
        )(flat, word_vecs)
        residual = jnp.transpose(flat.reshape(b, c, h, w), (0, 2, 3, 1))
        return x + residual


class SEM_TSRN(nn.Module):
    """Semantic-reasoning TSRN (model/tsrn.py:286-370, experimental):
    ReasoningResidualBlocks with per-block word-vector prediction.

    Returns (sr_image, [per-block predicted word vectors])."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    word_vec_d: int = 300

    @nn.compact
    def __call__(self, x, word_vecs=None, train: bool = True):
        from tpgsr_tpu.models.transformer import ImFeat2WordVec

        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        upsample_block_num = int(math.log2(self.scale_factor))

        if self.stn and train:
            _, ctrl = STNHead(name="stn_head")(x, train=train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor)
            )
            x, _ = tps(x, ctrl)

        block1 = TorchConv(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        block1 = PReLU(name="block1_prelu")(block1)

        w2v_proj = ImFeat2WordVec(self.word_vec_d, name="w2v_proj")
        all_pred_vecs = []
        b = block1
        for i in range(self.srb_nums):
            pred_vecs = w2v_proj(b)
            all_pred_vecs.append(pred_vecs)
            wv = word_vecs if (train and word_vecs is not None) else pred_vecs
            b = ReasoningResidualBlock(ch, name=f"block{i + 2}")(b, wv, train=train)

        b = TorchConv(ch, (3, 3), padding=(1, 1), name=f"block{self.srb_nums + 2}_conv")(b)
        b = BatchNorm(name=f"block{self.srb_nums + 2}_bn")(b, use_running_average=not train)

        h = block1 + b
        for j in range(upsample_block_num):
            h = UpsampleBlock(ch, 2, name=f"block{self.srb_nums + 3}_up{j}")(h)
        h = TorchConv(in_planes, (9, 9), padding=(4, 4), name=f"block{self.srb_nums + 3}_conv")(h)
        return jnp.tanh(h), all_pred_vecs
