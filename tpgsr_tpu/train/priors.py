"""Text-prior plumbing: recognizer input adapters and prior reshaping.

Parity targets:
  * ``parse_crnn_data`` (interfaces/base.py:806-829): bicubic resize of the
    RGB channels to 32x100 (width 100 because TRAIN.width==128), then
    ITU-R 601 grayscale 0.299R + 0.587G + 0.114B.
  * prior reshape (super_resolution.py:321): softmax logits [T, B, C] ->
    [B, C, 1, T] NCHW; here NHWC => [B, 1, T, C].
  * prior dropout (super_resolution.py:376-382): zero the prior for the
    first B//4 samples of the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpgsr_tpu.ops.resize import interpolate_bicubic


def parse_crnn_data(images_nhwc: jax.Array, width: int = 100) -> jax.Array:
    """[B,H,W,C>=3] in [0,1] -> [B,32,width,1] grayscale (in-graph)."""
    x = interpolate_bicubic(images_nhwc[..., :3], (32, width))
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def logits_to_prior(logits_tbc: jax.Array) -> jax.Array:
    """softmax over classes and [T,B,C] -> [B,1,T,C] (NHWC prior layout)."""
    probs = jax.nn.softmax(logits_tbc, axis=-1)
    return jnp.transpose(probs, (1, 0, 2))[:, None, :, :]


def prior_dropout_first_quarter(prior_b1tc: jax.Array) -> jax.Array:
    """Zero the prior for the first B//4 samples (static batch)."""
    b = prior_b1tc.shape[0]
    keep = jnp.ones((b,), prior_b1tc.dtype).at[: b // 4].set(0.0)
    return prior_b1tc * keep[:, None, None, None]


def parse_aster_data(images_nhwc: jax.Array) -> jax.Array:
    """[B,H,W,C>=3] in [0,1] -> [B,32,128,3] in [-1,1]
    (interfaces/base.py:844-864)."""
    x = interpolate_bicubic(images_nhwc[..., :3], (32, 128))
    return x * 2.0 - 1.0


def parse_moran_data(images_nhwc: jax.Array, width: int = 100) -> jax.Array:
    """[B,H,W,C>=3] in [0,1] -> [B,32,width,1] grayscale
    (interfaces/base.py:608-632: same resize+gray as parse_crnn_data; the
    '0'*20 dummy text/length tensors live in the MORAN decode protocol)."""
    return parse_crnn_data(images_nhwc, width)
