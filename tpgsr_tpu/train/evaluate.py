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
    mesh=None,
) -> Dict[str, float]:
    """Run the jitted ``eval_step`` over a loader and aggregate metrics.

    With ``vis_dir`` set, the first batch is dumped as LR|SR|HR grids via
    utils.visualize (reference demo/<vis>/ and display/<vis>/ outputs,
    interfaces/base.py:488-544).

    Pipelined: a background thread loads/pads (and, with ``mesh``, shards
    onto the device) the next batch, and batch i's outputs are materialized
    only after batch i+1's step is dispatched — so host decode work and
    host<->device transfers overlap TPU compute instead of serializing with
    it (matters doubly through a remote-TPU tunnel).
    """
    from tpgsr_tpu.utils.prefetch import prefetch_iter

    n_correct = 0
    n_correct_lr = 0
    n_correct_hr = 0
    stage_correct: Dict[int, int] = {}
    psnr_batches = []
    ssim_batches = []
    n_images = 0
    n_batches = 0

    # batches are padded up to the first batch's (mesh-divisible) size so
    # every step reuses one compiled shape; with a mesh the batch must also
    # divide across the devices (a val set smaller than batch_size would
    # otherwise make device_put raise).  The transform runs in the single
    # prefetch_iter producer thread, so full_batch's sequential growth and
    # the device_put both happen off the consumer's critical path.
    #
    # Multi-host (process_count > 1): every host's loader yields the SAME
    # full batches (val loaders never shard; shuffle=False), each host
    # device_puts only its contiguous row slice
    # (host_local_batch_to_global), and the step's per-sample outputs are
    # allgathered back so every host decodes and scores the full batch
    # identically — the metric_dict (and hence is_best / checkpoint
    # decisions) agrees on all hosts with the single-process run.
    from tpgsr_tpu.parallel import process_shard_info

    pi, pc = process_shard_info()
    mult = mesh.size if mesh is not None else 1
    full_batch = [0]

    def to_device(item):
        bi, batch = item
        labels = batch["labels"]
        # the eval step reads only hr/lr; the WTL collates also emit the
        # (eval-unused) label_vecs prior tensor — don't ship it
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and k in ("hr", "lr")}
        b = len(labels)
        target = max(full_batch[0], -(-b // mult) * mult)
        full_batch[0] = target
        if b < target:
            # padded rows are masked out below (labels has b entries)
            from tpgsr_tpu.data.loader import pad_batch

            arrays = pad_batch(arrays, target)
            arrays.pop("_valid")
        if mesh is not None:
            if pc > 1:
                from tpgsr_tpu.parallel import host_local_batch_to_global

                local = target // pc
                arrays = {k: v[pi * local : (pi + 1) * local] for k, v in arrays.items()}
                arrays = host_local_batch_to_global(mesh, arrays)
            else:
                from tpgsr_tpu.parallel import shard_batch

                arrays = shard_batch(mesh, arrays)
        return bi, batch, labels, b, arrays

    def src():
        # a closing generator (enumerate/islice would swallow .close(), and
        # prefetch_iter relies on it to release loader worker pools)
        it = iter(val_loader)
        try:
            for bi, batch in enumerate(it):
                if max_batches and bi >= max_batches:
                    break
                yield bi, batch
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()

    pending = None
    for bi, batch, labels, b, arrays in prefetch_iter(src(), to_device):
        dispatched = eval_step(state, arrays)  # async dispatch
        if pc > 1:
            # allgather the batch-sharded per-sample outputs so each host
            # scores the FULL batch (collective: every host reaches it on
            # every batch — loaders are identical, so counts agree)
            from tpgsr_tpu.parallel import gather_global_to_host

            sr_out, outs = dispatched
            outs = gather_global_to_host(mesh, outs)
            if vis_dir:
                sr_out = gather_global_to_host(mesh, sr_out)
            dispatched = (sr_out, outs)
        if pending is not None:
            _p = _process(pending, decoder, vis_dir, n_vis)
            n_correct += _p["c"]; n_correct_lr += _p["c_lr"]; n_correct_hr += _p["c_hr"]
            for i, c in _p["stage"].items():
                stage_correct[i] = stage_correct.get(i, 0) + c
            psnr_batches.append(_p["psnr"]); ssim_batches.append(_p["ssim"])
            n_images += _p["n"]; n_batches += 1
        pending = (bi, batch, labels, b) + dispatched
    if pending is not None:
        _p = _process(pending, decoder, vis_dir, n_vis)
        n_correct += _p["c"]; n_correct_lr += _p["c_lr"]; n_correct_hr += _p["c_hr"]
        for i, c in _p["stage"].items():
            stage_correct[i] = stage_correct.get(i, 0) + c
        psnr_batches.append(_p["psnr"]); ssim_batches.append(_p["ssim"])
        n_images += _p["n"]; n_batches += 1

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


def _process(pending, decoder, vis_dir, n_vis) -> Dict:
    """Materialize one dispatched batch's outputs and score it."""
    bi, batch, labels, b, sr_out, outs = pending
    outs = {k: np.asarray(v) for k, v in outs.items()}
    # reference aggregation: per-batch PSNR from batch-mean MSE, then a
    # plain mean over batches (super_resolution.py:974-975,1299-1339)
    mse = float(np.mean(outs["mse"][:b]))
    out = {
        "c": 0, "c_lr": 0, "c_hr": 0, "stage": {}, "n": b,
        "psnr": 20.0 * np.log10(255.0 / np.sqrt(max(mse, 1e-12))),
        "ssim": float(np.mean(outs["ssim"][:b])),
    }

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
                out["c"] += 1
            if str_filt(preds_lr[j], "lower") == gt_f:
                out["c_lr"] += 1
            if str_filt(preds_hr[j], "lower") == gt_f:
                out["c_hr"] += 1
            for i, ps in stage_preds.items():
                if str_filt(ps[j], "lower") == gt_f:
                    out["stage"][i] = out["stage"].get(i, 0) + 1
    return out
