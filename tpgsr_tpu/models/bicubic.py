"""Bicubic x2 baseline (model/bicubic.py:6-13): parameter-free —
``F.interpolate(mode='bicubic', align_corners=True)``.  A flax module (with
zero params) so it drops into the trainer/eval machinery like any arch."""

from __future__ import annotations

import jax
from flax import linen as nn

from tpgsr_tpu.ops.resize import interpolate_bicubic


class BICUBIC(nn.Module):
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        h, w = x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor
        return interpolate_bicubic(x, (h, w), align_corners=True)
