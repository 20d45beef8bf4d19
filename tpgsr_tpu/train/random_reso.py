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


def evaluate_random_reso_loader(
    val_loader,
    stu_applies: Sequence[Callable],
    sr_applies: Sequence[Callable],
    rec_apply: Callable,
    decoder: Callable,
    stu_iter: int = 1,
    conf_threshold: float = 0.85,
    min_height: int = 16,
    is_tl: bool = True,
) -> Dict[str, float]:
    """--random_reso validation over a loader of variable-resolution batches
    (super_resolution.py:624-731 + the ``type(images_sr) == list`` metric
    branches :832-1160).

    Batches come either from the syn_random_reso collate
    ({"hr_list","lr_list","labels"}, native resolutions) or from a
    fixed-shape collate ({"hr","lr",...} arrays, split per image).  Per
    image: stage-0 student confidence on the LR gates SR
    (conf > threshold AND H > min_height -> keep LR, reference
    :703-707 / :627-643); otherwise the cascade refreshes the prior from
    the previous stage's SR while every SR stage consumes the ORIGINAL LR
    (:718-730).  Metrics mirror the reference: eval-recognizer accuracy on
    SR/LR/HR after str_filt(.,'lower'), PSNR/SSIM vs HR with the SR output
    bilinearly resized on shape mismatch (:1007-1011), plus go_LR/go_SR
    gate counters.

    ``stu_applies``/``sr_applies``: per-stage fns (index i = cascade stage;
    pass the same fn stu_iter times for --tpg_share/--sr_share).  Every
    sr_apply takes (lr, prior) — plain (non-TL) archs ignore the prior.
    """
    from tpgsr_tpu.charset import str_filt
    from tpgsr_tpu.ops.image import calculate_psnr, ssim
    from tpgsr_tpu.ops.resize import interpolate_bilinear

    bucketed = [BucketedSR(fn) for fn in sr_applies]
    resize_cache: Dict[Tuple[int, int, int, int], Callable] = {}

    def _first(x):
        a = np.asarray(x, np.float32)
        return a[0] if a.ndim == 4 else a

    n = c_sr = c_lr = c_hr = 0
    psnrs: List[float] = []
    ssims: List[float] = []
    go = {"LR": 0, "SR": 0}
    for batch in val_loader:
        if "lr_list" in batch:
            lrs = [_first(x) for x in batch["lr_list"]]
            hrs = [_first(x) for x in batch["hr_list"]]
        else:
            lrs = list(np.asarray(batch["lr"], np.float32))
            hrs = list(np.asarray(batch["hr"], np.float32))
        labels = batch["labels"]
        confs = cal_conf(lrs, stu_applies[0])
        for img_lr, img_hr, label, conf in zip(lrs, hrs, labels, confs):
            x = img_lr[None]
            if conf > conf_threshold and x.shape[1] > min_height:
                sr = x
                go["LR"] += 1
            else:
                go["SR"] += 1
                cascade = x
                for i in range(stu_iter):
                    if is_tl:
                        logits = np.asarray(stu_applies[i](cascade))
                        prior = np.asarray(logits_to_prior(logits))
                    else:
                        prior = np.zeros((1, 1, 1, 1), np.float32)
                    cascade = bucketed[i](x, prior)
                sr = np.asarray(cascade)
            hr = img_hr[None]
            srm = sr
            if srm.shape != hr.shape:
                key = srm.shape[1:3] + hr.shape[1:3]
                fn = resize_cache.get(key)
                if fn is None:
                    import functools

                    import jax

                    fn = jax.jit(functools.partial(
                        interpolate_bilinear, size=hr.shape[1:3]))
                    resize_cache[key] = fn
                srm = np.asarray(fn(srm))
            psnrs.append(float(calculate_psnr(srm, hr)))
            ssims.append(float(ssim(srm, hr)))
            gt = str_filt(label, "lower")
            p_sr = str_filt(decoder(np.asarray(rec_apply(sr)))[0], "lower")
            p_lr = str_filt(decoder(np.asarray(rec_apply(x)))[0], "lower")
            p_hr = str_filt(decoder(np.asarray(rec_apply(hr)))[0], "lower")
            c_sr += int(p_sr == gt)
            c_lr += int(p_lr == gt)
            c_hr += int(p_hr == gt)
            n += 1
    d = float(max(n, 1))
    return {
        "accuracy": c_sr / d,
        "accuracy_lr": c_lr / d,
        "accuracy_hr": c_hr / d,
        "psnr_avg": float(np.mean(psnrs)) if psnrs else 0.0,
        "ssim_avg": float(np.mean(ssims)) if ssims else 0.0,
        "images": n,
        "go_LR": go["LR"],
        "go_SR": go["SR"],
    }
