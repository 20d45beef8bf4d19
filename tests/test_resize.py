"""Parity tests for in-graph resize vs torch.nn.functional.interpolate and PIL."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from tpgsr_tpu.ops.resize import (
    interpolate_bicubic,
    interpolate_bilinear,
    resize_pil_equivalent,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(t_nchw):
    return np.transpose(t_nchw.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [((16, 64), (32, 100)), ((32, 128), (32, 100)), ((16, 64), (32, 128)), ((7, 13), (32, 100))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bicubic_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.random((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(interpolate_bicubic(x, out_hw, align_corners=align_corners))
    ref = _nhwc(F.interpolate(_nchw(x), out_hw, mode="bicubic", align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((1, 203), (16, 64)), ((16, 64), (8, 32)), ((4, 52), (16, 64))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.random((2, *in_hw, 5), dtype=np.float32)
    ours = np.asarray(interpolate_bilinear(x, out_hw, align_corners=align_corners))
    ref = _nhwc(F.interpolate(_nchw(x), out_hw, mode="bilinear", align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((37, 93), (32, 128)), ((128, 256), (16, 64))])
def test_pil_equivalent_resize(rng, in_hw, out_hw):
    # PIL operates on uint8 with fixed-point accumulation; allow 1/255 slack.
    img = (rng.random((*in_hw, 3)) * 255).astype(np.uint8)
    pil = Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BICUBIC)
    ref = np.asarray(pil).astype(np.float32) / 255.0
    x = img[None].astype(np.float32) / 255.0
    ours = np.asarray(resize_pil_equivalent(x, out_hw, "bicubic"))[0]
    assert np.abs(ours - ref).max() <= 1.5 / 255.0
