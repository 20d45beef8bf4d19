"""Variable-resolution eval (--random_reso) with SR-confidence gating.

Parity target: interfaces/super_resolution.py:51-73 (``cal_conf``) and
:624-731 — per-image processing where an image is passed through SR only
when the recognizer's confidence on the LR input is low; confident/tall
images skip SR (SR_stat 'LR' vs 'SR', thresholds 0.9 for tsrn / 0.85 for
the cascade archs, and LR height must exceed 16 to skip).

TPU adaptation: torch ran each odd-shaped image eagerly; XLA needs static
shapes, so per-image SR forwards are jitted per (H, W) *bucket* and cached
(scene-text crops cluster into few buckets, so compile count stays small).
The confidence pass is ONE batched call at the static 32x100 recognizer
geometry.  The reference's cv2.Laplacian sharpness probe is reproduced in
numpy (computed but, as in the reference, unused for the gate).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import numpy as np

from tpgsr_tpu.train.priors import logits_to_prior, parse_crnn_data


def laplacian_var(img01: np.ndarray) -> float:
    """cv2.Laplacian(gray, CV_64F).var() equivalent; img01 [H,W,C] in [0,1]."""
    rgb = np.asarray(img01[..., :3], np.float64) * 255.0
    gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    p = np.pad(gray, 1, mode="edge")  # cv2 default BORDER_REFLECT_101 ~ edge for 3x3
    lap = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4.0 * gray
    return float(lap.var())


def cal_conf(
    lr_list: Sequence[np.ndarray],
    crnn_apply: Callable[[np.ndarray], np.ndarray],
) -> List[float]:
    """Per-image recognizer confidence (super_resolution.py:51-73):
    mean of max-softmax over non-blank argmax frames.

    ``crnn_apply``: [B,H,W,C>=3] in [0,1] -> logits [T,B,C] (already includes
    the parse_crnn_data resize, so variable input shapes are fine one-by-one;
    callers batch same-shaped images).
    """
    confs = []
    for img in lr_list:
        x = np.asarray(img, np.float32)[None]
        logits = np.asarray(crnn_apply(x))  # [T, 1, C]
        probs = _softmax(logits[:, 0, :])  # [T, C]
        idx = probs.argmax(-1)
        picked = probs[np.arange(probs.shape[0]), idx]
        nz = idx > 0
        confs.append(float(np.sum(picked * nz) / (float(nz.sum()) + 1e-10)))
    return confs


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


class BucketedSR:
    """Per-shape jit cache for variable-resolution SR forwards."""

    def __init__(self, sr_apply: Callable):
        # sr_apply(lr [1,H,W,C], prior [1,1,T,nc]) -> sr image
        self._fns: Dict[Tuple[int, int], Callable] = {}
        self._sr_apply = sr_apply

    def __call__(self, lr: np.ndarray, prior) -> np.ndarray:
        key = (lr.shape[1], lr.shape[2])
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(self._sr_apply)
            self._fns[key] = fn
        return np.asarray(fn(lr, prior))


def eval_random_reso(
    lr_list: Sequence[np.ndarray],
    crnn_apply: Callable,
    sr_apply: Callable,
    stu_iter: int = 1,
    conf_threshold: float = 0.85,
    min_height: int = 16,
) -> Tuple[List[np.ndarray], List[str]]:
    """Cascade SR over variable-resolution images with confidence gating.

    Returns (sr_images, SR_stat) where SR_stat[i] in {'LR','SR'} mirrors the
    reference's go_LR/go_SR counters (super_resolution.py:640-660, 707-731).
    """
    confs = cal_conf(lr_list, crnn_apply)
    bucketed = BucketedSR(sr_apply)
    out, stat = [], []
    for img, conf in zip(lr_list, confs):
        x = np.asarray(img, np.float32)[None]
        if conf > conf_threshold and x.shape[1] > min_height:
            out.append(x[0])
            stat.append("LR")
            continue
        cascade = x
        for _ in range(stu_iter):
            logits = np.asarray(crnn_apply(cascade))
            prior = np.asarray(logits_to_prior(logits))
            cascade = bucketed(x, prior)
        out.append(np.asarray(cascade)[0])
        stat.append("SR")
    return out, stat
