"""Visualization dumps: vertical LR|SR|HR grids saved as PNGs.

Parity targets: interfaces/base.py:488-513 (``tripple_display`` — first
n_vis samples to demo/<vis_dir>/<index>/<lr>_<sr>_<gt>_.png) and :515-544
(``test_display`` — samples the SR recognizer fixed, to
display/<vis_dir>/).  Images here are NHWC float in [0,1]; the LR image is
bicubic-upscaled to the HR size before stacking.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np
from PIL import Image


def _to_pil(arr01: np.ndarray) -> Image.Image:
    a = np.asarray(arr01)[..., :3]
    if a.dtype == np.uint8:  # compact wire-format batches
        return Image.fromarray(a)
    a = np.clip(a, 0.0, 1.0)
    return Image.fromarray((a * 255.0 + 0.5).astype(np.uint8))


def _grid(lr: np.ndarray, sr: np.ndarray, hr: np.ndarray) -> Image.Image:
    h, w = hr.shape[0], hr.shape[1]
    lr_up = _to_pil(lr).resize((w, h), Image.BICUBIC)
    canvas = Image.new("RGB", (w, 3 * h))
    canvas.paste(lr_up, (0, 0))
    canvas.paste(_to_pil(sr), (0, h))
    canvas.paste(_to_pil(hr), (0, 2 * h))
    return canvas


def _safe(s: str) -> str:
    return s.replace("/", "")


def tripple_display(
    images_lr: np.ndarray,
    images_sr: np.ndarray,
    images_hr: np.ndarray,
    pred_str_lr: Sequence[str],
    pred_str_sr: Sequence[str],
    label_strs: Sequence[str],
    index: int,
    vis_dir: str,
    n_vis: int = 10,
    out_root: str = "./demo",
) -> None:
    """Save the first n_vis samples as LR|SR|HR grids (skips index 0, as the
    reference does)."""
    from tpgsr_tpu.train.checkpoint import is_primary_host

    if index == 0 or not is_primary_host():
        return
    out = os.path.join(out_root, vis_dir, str(index))
    os.makedirs(out, exist_ok=True)
    n = min(n_vis, images_lr.shape[0])
    for i in range(n):
        name = _safe(f"{pred_str_lr[i]}_{pred_str_sr[i]}_{label_strs[i]}_.png")
        _grid(images_lr[i], images_sr[i], images_hr[i]).save(os.path.join(out, name))


def test_display(
    images_lr: np.ndarray,
    images_sr: np.ndarray,
    images_hr: np.ndarray,
    pred_str_lr: Sequence[str],
    pred_str_sr: Sequence[str],
    label_strs: Sequence[str],
    str_filt: Callable[[str, str], str],
    vis_dir: str,
    out_root: str = "./display",
) -> int:
    """Save samples where SR fixed the recognition (LR wrong, SR right);
    returns the count counted (multi-host: every process counts identically,
    only process 0 writes the PNGs)."""
    from tpgsr_tpu.train.checkpoint import is_primary_host

    write = is_primary_host()
    out = os.path.join(out_root, vis_dir)
    if write:
        os.makedirs(out, exist_ok=True)
    visualized = 0
    for i in range(images_lr.shape[0]):
        gt = str_filt(label_strs[i], "lower")
        if str_filt(pred_str_lr[i], "lower") != gt and str_filt(pred_str_sr[i], "lower") == gt:
            visualized += 1
            if write:
                name = _safe(f"{pred_str_lr[i]}_{pred_str_sr[i]}_{label_strs[i]}_.png")
                _grid(images_lr[i], images_sr[i], images_hr[i]).save(os.path.join(out, name))
    return visualized
