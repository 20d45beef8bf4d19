"""STN rectification head and thin-plate-spline spatial transformer.

Parity targets:
  * ``STNHead``: model/stn_head.py:25-106 — 6x conv3x3+BN+ReLU+maxpool trunk,
    FC512 (+BN1d), FC to 2x20 control points with zero weights and bias
    initialized to a border grid; the FC2 input is scaled by 0.1.
  * ``TPSSpatialTransformer``: model/tps_spatial_transformer.py:54-112 —
    precomputed inverse kernel of the r^2 log r radial basis over 20 target
    control points; forward solves the mapping and bilinear-samples.

The TPS solve is two small matmuls against constant matrices (baked at
module setup from static sizes) followed by the Pallas/gather grid sampler.
"""

from __future__ import annotations

import itertools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpgsr_tpu.models.layers import TorchBatchNorm, TorchLinear
from tpgsr_tpu.ops.grid_sample import grid_sample


def _conv_msra_init(fan_out_elems: int):
    """normal(0, sqrt(2/n)) with n = kh*kw*out_ch (stn_head.py:59-65)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out_elems)

    return init


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        kh = kw = 3
        kernel = self.param(
            "kernel", _conv_msra_init(kh * kw * self.features), (kh, kw, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)
        x = TorchBatchNorm(use_running_average=not train, name="BatchNorm_0")(x)
        return nn.relu(x)


def _init_ctrl_points(num_ctrlpoints: int, margin: float = 0.01) -> np.ndarray:
    num_side = num_ctrlpoints // 2
    ctrl_x = np.linspace(margin, 1.0 - margin, num_side)
    top = np.stack([ctrl_x, np.full(num_side, margin)], axis=1)
    bot = np.stack([ctrl_x, np.full(num_side, 1.0 - margin)], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


class STNHead(nn.Module):
    """Predict 20 TPS control points from the (LR) image.

    Two reference variants share this module:
      * SR (model/stn_head.py:34-45, 16x64 input): 5th pool is (1,2) —
        ``last_pool=(1, 2)`` (default).
      * recognizer (model/recognizer/stn_head.py:33-44, 32x64 input): all
        five pools are (2,2) — pass ``last_pool=(2, 2)`` (ASTER).
    """

    num_ctrlpoints: int = 20
    activation: str = "none"
    last_pool: Tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x, train: bool = True):
        # conv(32) pool2 conv(64) pool2 conv(128) pool2 conv(256) pool2
        # conv(256) pool(last_pool) conv(256)
        x = _ConvBlock(32)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvBlock(64)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvBlock(128)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvBlock(256)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvBlock(256)(x, train)
        x = nn.max_pool(x, self.last_pool, self.last_pool)
        x = _ConvBlock(256)(x, train)
        b = x.shape[0]
        # reference flattens NCHW ([B, 256, 1, 2] -> [B, 512] with channel-major
        # order); transpose to match so torch FC weights import directly.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)

        # fc1: Linear(512) + BN1d + ReLU, weights normal(0, 0.001), bias 0
        w1 = self.param("fc1_kernel", lambda k, s: jax.random.normal(k, s) * 0.001, (x.shape[-1], 512))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (512,))
        img_feat = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
        img_feat = TorchBatchNorm(use_running_average=not train, name="BatchNorm_0")(img_feat)
        img_feat = nn.relu(img_feat)

        # fc2: zero weights, bias = init control-point grid (stn_head.py:73-90)
        ctrl_init = _init_ctrl_points(self.num_ctrlpoints).reshape(-1)
        w2 = self.param("fc2_kernel", nn.initializers.zeros, (512, self.num_ctrlpoints * 2))
        b2 = self.param("fc2_bias", lambda k, s: jnp.asarray(ctrl_init), (self.num_ctrlpoints * 2,))
        pts = (0.1 * img_feat) @ w2.astype(x.dtype) + b2.astype(x.dtype)
        if self.activation == "sigmoid":
            pts = jax.nn.sigmoid(pts)
        elif self.activation == "relu":
            pts = nn.relu(pts)
        return img_feat, pts.reshape(-1, self.num_ctrlpoints, 2)


def _partial_repr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """phi(r) = 0.5 * r^2 * log(r^2) over pairwise distances, nan->0."""
    diff = a[:, None, :] - b[None, :, :]
    dist = (diff**2).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = 0.5 * dist * np.log(dist)
    rep[~np.isfinite(rep)] = 0.0
    return rep


def build_output_control_points(num_control_points: int, margins: Tuple[float, float]) -> np.ndarray:
    margin_x, margin_y = margins
    num_side = num_control_points // 2
    ctrl_x = np.linspace(margin_x, 1.0 - margin_x, num_side)
    top = np.stack([ctrl_x, np.full(num_side, margin_y)], axis=1)
    bot = np.stack([ctrl_x, np.full(num_side, 1.0 - margin_y)], axis=1)
    return np.concatenate([top, bot], axis=0)


class TPSSpatialTransformer:
    """Stateless TPS transform with precomputed constant matrices.

    Not a flax module: it has no trainable parameters, only constants
    derived from (output_image_size, num_control_points, margins).
    """

    def __init__(
        self,
        output_image_size: Tuple[int, int],
        num_control_points: int = 20,
        margins: Tuple[float, float] = (0.05, 0.05),
        align_corners: bool = False,
    ):
        self.target_height, self.target_width = output_image_size
        self.num_control_points = num_control_points
        self.align_corners = align_corners

        target_cp = build_output_control_points(num_control_points, margins)
        n = num_control_points
        forward_kernel = np.zeros((n + 3, n + 3))
        forward_kernel[:n, :n] = _partial_repr(target_cp, target_cp)
        forward_kernel[:n, n] = 1.0
        forward_kernel[n, :n] = 1.0
        forward_kernel[:n, n + 1 :] = target_cp
        forward_kernel[n + 1 :, :n] = target_cp.T
        inverse_kernel = np.linalg.inv(forward_kernel)

        hw = self.target_height * self.target_width
        coords = np.array(
            list(itertools.product(range(self.target_height), range(self.target_width))),
            dtype=np.float64,
        )
        y = coords[:, 0:1] / (self.target_height - 1)
        x = coords[:, 1:2] / (self.target_width - 1)
        target_coordinate = np.concatenate([x, y], axis=1)  # (x, y) order
        repr_mat = np.concatenate(
            [_partial_repr(target_coordinate, target_cp), np.ones((hw, 1)), target_coordinate],
            axis=1,
        )
        self.inverse_kernel = inverse_kernel.astype(np.float32)  # [N+3, N+3]
        self.target_coordinate_repr = repr_mat.astype(np.float32)  # [HW, N+3]

    def __call__(self, x: jax.Array, source_control_points: jax.Array):
        """x: [B,H,W,C]; source_control_points: [B,N,2] in [0,1] space."""
        b = source_control_points.shape[0]
        pad = jnp.zeros((b, 3, 2), source_control_points.dtype)
        y = jnp.concatenate([source_control_points, pad], axis=1)  # [B, N+3, 2]
        ik = jnp.asarray(self.inverse_kernel, x.dtype)
        rep = jnp.asarray(self.target_coordinate_repr, x.dtype)
        mapping = jnp.einsum("kn,bnd->bkd", ik, y)
        source_coordinate = jnp.einsum("hk,bkd->bhd", rep, mapping)  # [B, HW, 2]
        grid = source_coordinate.reshape(b, self.target_height, self.target_width, 2)
        grid = jnp.clip(grid, 0.0, 1.0) * 2.0 - 1.0
        out = grid_sample(x, grid, align_corners=self.align_corners)
        return out, source_coordinate
