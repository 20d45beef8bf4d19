"""Validation loop: PSNR/SSIM + word-accuracy over a val loader.

Parity target: TextSR.eval (interfaces/super_resolution.py:540-1347) —
cascade inference without grads, eval recognizer on LR/HR and each stage's
SR, exact-match accuracy after ``str_filt(·,'lower')``, running PSNR/SSIM
averages, metric_dict {accuracy (last stage), psnr_avg, ssim_avg, ...}.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from tpgsr_tpu.charset import str_filt
from tpgsr_tpu.ops.ctc import ctc_ids_to_strings


def _decode_crnn(logits_tbc: np.ndarray) -> List[str]:
    ids = np.argmax(np.asarray(logits_tbc), axis=-1)
    return ctc_ids_to_strings(ids)


def evaluate(
    eval_step: Callable,
    state,
    val_loader,
    decoder: Callable = _decode_crnn,
    max_batches: int = 0,
    vis_dir: str = "",
    n_vis: int = 10,
) -> Dict[str, float]:
    """Run the jitted ``eval_step`` over a loader and aggregate metrics.

    With ``vis_dir`` set, the first batch is dumped as LR|SR|HR grids via
    utils.visualize (reference demo/<vis>/ and display/<vis>/ outputs,
    interfaces/base.py:488-544).
    """
    n_correct = 0
    n_correct_lr = 0
    n_correct_hr = 0
    stage_correct: Dict[int, int] = {}
    psnr_batches = []
    ssim_batches = []
    n_images = 0
    n_batches = 0
    full_batch = 0  # first batch fixes the compiled shape

    for bi, batch in enumerate(val_loader):
        if max_batches and bi >= max_batches:
            break
        labels = batch["labels"]
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        b = len(labels)
        if full_batch == 0:
            full_batch = b
        elif b < full_batch:
            # pad the final partial batch to the compiled shape (one compile
            # per split instead of two); padded rows are masked out below
            arrays = {
                k: np.concatenate([v, np.repeat(v[-1:], full_batch - b, axis=0)])
                for k, v in arrays.items()
            }
        sr_out, outs = eval_step(state, arrays)
        outs = {k: np.asarray(v) for k, v in outs.items()}
        # reference aggregation: per-batch PSNR from batch-mean MSE, then a
        # plain mean over batches (super_resolution.py:974-975,1299-1339)
        mse = float(np.mean(outs["mse"][:b]))
        psnr_batches.append(20.0 * np.log10(255.0 / np.sqrt(max(mse, 1e-12))))
        ssim_batches.append(float(np.mean(outs["ssim"][:b])))
        n_images += b
        n_batches += 1

        if "logits_sr" in outs:
            preds_sr = decoder(outs["logits_sr"])
            preds_lr = decoder(outs["logits_lr"])
            preds_hr = decoder(outs["logits_hr"])
            if vis_dir and bi == 0:
                from tpgsr_tpu.charset import str_filt as _sf
                from tpgsr_tpu.utils.visualize import test_display, tripple_display

                sr_np = np.asarray(sr_out)
                tripple_display(batch["lr"], sr_np, batch["hr"], preds_lr,
                                preds_sr, labels, index=1, vis_dir=vis_dir,
                                n_vis=n_vis)
                test_display(batch["lr"], sr_np, batch["hr"], preds_lr,
                             preds_sr, labels, _sf, vis_dir)
            stage_preds = {
                i: decoder(outs[f"logits_stage{i}"])
                for i in range(64)
                if f"logits_stage{i}" in outs
            }
            for j, gt in enumerate(labels):  # labels has only the b valid rows
                gt_f = str_filt(gt, "lower")
                if str_filt(preds_sr[j], "lower") == gt_f:
                    n_correct += 1
                if str_filt(preds_lr[j], "lower") == gt_f:
                    n_correct_lr += 1
                if str_filt(preds_hr[j], "lower") == gt_f:
                    n_correct_hr += 1
                for i, ps in stage_preds.items():
                    if str_filt(ps[j], "lower") == gt_f:
                        stage_correct[i] = stage_correct.get(i, 0) + 1

    metrics = {
        "accuracy": n_correct / max(n_images, 1),
        "accuracy_lr": n_correct_lr / max(n_images, 1),
        "accuracy_hr": n_correct_hr / max(n_images, 1),
        "psnr_avg": float(np.mean(psnr_batches)) if psnr_batches else 0.0,
        "ssim_avg": float(np.mean(ssim_batches)) if ssim_batches else 0.0,
        "images": n_images,
    }
    for i, c in stage_correct.items():
        metrics[f"accuracy_stage{i}"] = c / max(n_images, 1)
    return metrics
