"""Training losses.

Parity targets:
  * ``ImageLoss``: loss/image_loss.py:10-30 — w0*MSE + w1*GradientPrior over
    RGB channels (trainer passes weights [1, 1e-4] and multiplies by 100:
    interfaces/base.py:298-328, super_resolution.py:385).
  * ``GradientPriorLoss``: loss/image_loss.py:33-51 — L1 between
    central-difference gradient magnitude maps.
  * ``SemanticLoss`` (TP distillation): loss/semantic_loss.py:10-43 —
    mean|gt - pred| + KLDiv(log(pred+1e-20), gt+1e-20) with torch
    KLDivLoss's (deprecated) elementwise-mean reduction.
  * SSIM loss: (1 - SSIM)*10 (super_resolution.py:388-391).
  * ``L1_Charbonnier_loss``: model/lapsrn.py:126 — sqrt(diff^2 + 1e-6) sum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpgsr_tpu.ops.image import gradient_map, ssim


def mse_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def gradient_prior_loss(out_images: jax.Array, target_images: jax.Array) -> jax.Array:
    """L1 between gradient maps (RGB channels), NHWC."""
    return l1_loss(gradient_map(out_images), gradient_map(target_images))


def image_loss(
    out_images: jax.Array,
    target_images: jax.Array,
    gradient: bool = True,
    loss_weight: Tuple[float, float] = (1.0, 1e-4),
) -> jax.Array:
    loss = loss_weight[0] * mse_loss(out_images, target_images)
    if gradient:
        loss = loss + loss_weight[1] * gradient_prior_loss(
            out_images[..., :3], target_images[..., :3]
        )
    return loss


def semantic_loss(pred_vec: jax.Array, gt_vec: jax.Array) -> jax.Array:
    """TP distillation on softmaxed [T, B, C] probability sequences."""
    margin_loss = jnp.mean(jnp.abs(gt_vec - pred_vec))
    # torch nn.KLDivLoss() default: pointwise target*(log(target)-input),
    # averaged over ALL elements.  input = log(pred+eps), target = gt+eps.
    eps = 1e-20
    target = gt_vec + eps
    kl = target * (jnp.log(target) - jnp.log(pred_vec + eps))
    return margin_loss + jnp.mean(kl)


def ssim_loss(sr: jax.Array, hr: jax.Array) -> jax.Array:
    return (1.0 - ssim(sr, hr)) * 10.0


def charbonnier_loss(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LapSRN's L1_Charbonnier (model/lapsrn.py:126-137): the reference SUMS
    sqrt(diff^2+eps) over all elements (no normalization)."""
    diff = a - b
    return jnp.sum(jnp.sqrt(diff * diff + eps))
