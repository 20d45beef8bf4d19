"""Bicubic x2 baseline (model/bicubic.py:6-13): not a trainable model —
``F.interpolate(mode='bicubic', align_corners=True)``."""

from __future__ import annotations

import jax

from tpgsr_tpu.ops.resize import interpolate_bicubic


class BICUBIC:
    def __init__(self, scale_factor: int = 2):
        self.scale_factor = scale_factor

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor
        return interpolate_bicubic(x, (h, w), align_corners=True)
