"""VGG16 feature trunk for the perceptual loss.

Parity target: loss/percptual_loss.py:7-47 — ``GeneratorLoss`` uses
``vgg16(pretrained=True).features[:31]`` (conv1_1 .. relu5_3, the trunk up
to but excluding the last maxpool) as a frozen loss network, plus a TV loss:
``image_mse + 0.006 * perceptual_mse + 2e-8 * tv``.

This loss is present but NOT wired into the reference's main training path
(SURVEY.md §2.7); it is provided here for the same ablations.  Pretrained
VGG weights are not bundled (no network egress in this environment) —
``import_vgg16_features`` converts a torchvision VGG16 state_dict when you
have one; random init otherwise.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchConv

# torchvision vgg16.features conv layout: (out_ch, layers-per-stage)
_VGG16_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGG16Features(nn.Module):
    """features[:31]: five conv stages, maxpool after the first four."""

    @nn.compact
    def __call__(self, x):
        li = 0
        for stage, (ch, reps) in enumerate(_VGG16_CFG):
            for _ in range(reps):
                x = nn.relu(TorchConv(ch, (3, 3), padding=(1, 1), name=f"conv{li}")(x))
                li += 1
            if stage < 4:  # features[:31] stops before the 5th maxpool
                x = nn.max_pool(x, (2, 2), (2, 2))
        return x


def import_vgg16_features(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision VGG16 ``features`` state_dict (keys ``features.N.*``
    with N in the Sequential indices) onto VGG16Features."""
    import numpy as np

    from tpgsr_tpu.interop.torch_import import conv_w

    # Sequential conv indices in torchvision vgg16.features
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: Dict = {}
    for li, n in enumerate(conv_idx):
        w = sd.get(f"features.{n}.weight", sd.get(f"{n}.weight"))
        b = sd.get(f"features.{n}.bias", sd.get(f"{n}.bias"))
        params[f"conv{li}"] = {
            "kernel": conv_w(np.asarray(w)),
            "bias": np.asarray(b),
        }
    return {"params": params}


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total-variation loss (percptual_loss.py:30-47), NHWC."""
    b, h, w, c = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, : h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : w - 1, :]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def generator_loss(
    vgg_variables: Dict[str, Any], out_images: jax.Array, target_images: jax.Array
) -> jax.Array:
    """image_mse + 0.006 * perceptual_mse + 2e-8 * tv (percptual_loss.py:20-27)."""
    net = VGG16Features()
    feat_out = net.apply(vgg_variables, out_images[..., :3])
    feat_tgt = jax.lax.stop_gradient(net.apply(vgg_variables, target_images[..., :3]))
    perception = jnp.mean((feat_out - feat_tgt) ** 2)
    image = jnp.mean((out_images - target_images) ** 2)
    return image + 0.006 * perception + 2e-8 * tv_loss(out_images)
