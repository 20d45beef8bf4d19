"""Annotated-transformer components used by the sem_tsrn experimental arch.

Parity targets (model/model_transformer.py):
  * ``MultiHeadedAttention`` (annotated-transformer style: 4 linears,
    scaled dot-product) — :18-120 region.
  * ``LayerNorm`` (features, eps 1e-6) and ``PositionwiseFeedForward``
    (two linears + ReLU + dropout).
  * ``FeatureEnhancerW2V`` (:407-446): self-attention + FFN with residual
    layernorms over the flattened [B, C, H*W] conv feature (the w2v_proj
    linear exists but is bypassed in the reference's forward).

Dropout is inference-disabled by default (sem_tsrn is a partially-dead
experimental path in the reference; we keep it runnable and deterministic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchLinear


class LayerNorm(nn.Module):
    """a_2 * (x - mean) / (std + eps) + b_2 (annotated transformer)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        a2 = self.param("a_2", nn.initializers.ones, (features,))
        b2 = self.param("b_2", nn.initializers.zeros, (features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        # torch Tensor.std defaults to the Bessel-corrected estimator
        std = jnp.std(x, axis=-1, keepdims=True, ddof=1)
        return a2 * (x - mean) / (std + self.eps) + b2


class MultiHeadedAttention(nn.Module):
    """h-head scaled dot-product attention with 4 projection linears."""

    h: int = 4
    d_model: int = 64

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        d_k = self.d_model // self.h
        b = query.shape[0]

        def proj(x, name):
            y = TorchLinear(self.d_model, name=name)(x)
            return y.reshape(b, -1, self.h, d_k).transpose(0, 2, 1, 3)

        q = proj(query, "linear_q")
        k = proj(key, "linear_k")
        v = proj(value, "linear_v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d_k).astype(q.dtype)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        return TorchLinear(self.d_model, name="linear_out")(out)


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_ff: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(TorchLinear(self.d_ff, name="w_1")(x))
        return TorchLinear(self.d_model, name="w_2")(h)


class FeatureEnhancerW2V(nn.Module):
    """Self-attention + FFN over [B, C, T] conv features
    (model_transformer.py:407-446; the word2vec projection is present but
    bypassed, as in the reference forward)."""

    vec_d: int = 300
    feature_size: int = 64
    head_num: int = 4

    @nn.compact
    def __call__(self, conv_feature_bct, word2vec=None):
        x = jnp.transpose(conv_feature_bct, (0, 2, 1))  # [B, T, C]
        attn = MultiHeadedAttention(self.head_num, self.feature_size,
                                    name="mask_multihead")(x, x, x)
        x = LayerNorm(name="mul_layernorm1")(x + attn)
        ff = PositionwiseFeedForward(self.feature_size, self.feature_size, name="pff")(x)
        x = LayerNorm(name="mul_layernorm3")(x + ff)
        return jnp.transpose(x, (0, 2, 1))  # [B, C, T]


class ImFeat2WordVec(nn.Module):
    """Global-average image feature -> word vector (model/tsrn.py:511-524)."""

    vec_d: int = 300

    @nn.compact
    def __call__(self, x_nhwc):
        pooled = jnp.mean(x_nhwc, axis=(1, 2))  # [B, C]
        return TorchLinear(self.vec_d, name="vec_proj")(pooled)
