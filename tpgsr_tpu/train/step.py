"""The jit-compiled train/eval steps — the heart of the framework.

One XLA program per step: teacher TPG forward (frozen), ``stu_iter``-stage
cascade of (student TPG -> prior -> SR backbone), all losses, grads for
SR + student jointly, per-SR-model 0.25 global-norm clip, Adam update.

Parity target: interfaces/super_resolution.py:192-424 (train loop body) —
with these TPU-first deviations:
  * everything (incl. the recognizer 32x100 resize, which torch did with
    cuDNN `interpolate`) is inside one jit; resizes are matmul-based.
  * cascade stages are a Python loop at trace time (stu_iter <= 3): XLA sees
    a straight-line graph and fuses across stages; `jax.checkpoint` remats
    each SR stage to bound the un-detached-cascade autodiff memory
    (SURVEY.md §7 "cascade autodiff memory").
  * batch-parallelism comes from sharded batch inputs (see
    tpgsr_tpu.parallel), not DataParallel replicas.

Semantics mirrored exactly: loss x100 scalings, prior dropout of the first
B//4 samples, student TP fed from the previous stage's SR output while the
SR image input is always images_lr (super_resolution.py:301-384), gradients
flowing through the whole cascade (no detach), CTC loss masked by
weighted_tics, distill loss vs the HR teacher prior.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpgsr_tpu import losses as L
from tpgsr_tpu.models.registry import ABLATION_SET, TL_SIMPLE, ArchSpec
from tpgsr_tpu.ops.ctc import ctc_loss
from tpgsr_tpu.ops import tiling
from tpgsr_tpu.ops.image import append_contour_mask_u8, calculate_psnr, ssim
from tpgsr_tpu.ops.resize import interpolate_bicubic
from tpgsr_tpu.train.priors import (
    logits_to_prior,
    parse_crnn_data,
    prior_dropout_first_quarter,
)
from tpgsr_tpu.train.state import TrainState, clip_sr_grads, make_optimizer


def _image_crit(kind: str, gradient: bool) -> Callable:
    if kind == "image":
        return lambda sr, hr: L.image_loss(sr, hr, gradient=gradient)
    if kind == "mse":
        return L.mse_loss
    if kind == "l1":
        return L.l1_loss
    if kind == "charbonnier":
        return L.charbonnier_loss
    raise ValueError(kind)


def _apply(model, params, stats, args_, train: bool):
    """Run a flax module, returning (out, new_stats)."""
    variables = {"params": params, "batch_stats": stats}
    if train:
        out, mut = model.apply(variables, *args_, train=True, mutable=["batch_stats"])
        return out, mut.get("batch_stats", stats)
    out = model.apply(variables, *args_, train=False)
    return out, stats


def _crnn_width(cfg_width: int) -> int:
    # interfaces/base.py:808 — 100 when TRAIN.width is 128, else TRAIN.width
    return 100 if cfg_width == 128 else cfg_width


def _ensure_mask(arr, want: bool):
    """Re-attach the 4th contour-mask channel when the wire shipped plain
    RGB (CollateConfig.device_mask): a deterministic function of the RGB, so
    computing it here (bit-identical integer math, ops.image) saves ~20% of
    the transfer-bound host->device wire.  No-op for 4-channel or float
    wires.  Shape/dtype checks are static under jit."""
    if want and arr.dtype == jnp.uint8 and arr.shape[-1] == 3:
        return append_contour_mask_u8(arr)
    return arr


def train_wire_keys(arch: str) -> frozenset:
    """Array keys the jitted train step actually reads from the batch.

    The device wire ships ONLY these: the collates also emit host/eval-side
    tensors (``label_vecs`` — the reference's text_label, which our step
    replaces with the precomputed ctc_labels/ctc_lengths) that would
    otherwise cost ~16% of the transfer-bound wire for nothing."""
    if arch in ABLATION_SET or arch in TL_SIMPLE:
        return frozenset({"hr", "lr", "ctc_labels", "ctc_lengths", "weighted_tics"})
    if arch == "tsrn_c2f":
        return frozenset({"hr", "lr", "coarse"})
    if arch == "sem_tsrn":
        return frozenset({"hr", "lr", "w2v"})
    return frozenset({"hr", "lr"})


def _as_image(arr, dtype):
    """Batch image -> compute dtype in [0,1].  uint8 wire format (the
    compact collate output) is divided by 255 here, on device.  The divide
    happens in fp32 regardless of the compute dtype so the uint8 wire stays
    bit-identical to host-side fp32 normalization (PIL decodes to uint8
    either way); only the final cast is in bf16 — the same rounding the
    float wire path gets."""
    if arr.dtype == jnp.uint8:
        return (arr.astype(jnp.float32) / 255.0).astype(dtype)
    return arr.astype(dtype)


def make_train_step(
    arch: str,
    spec: ArchSpec,
    sr_model,
    stu_model,
    args,
    config,
    donate: bool = True,
):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    ``batch`` is a dict of device arrays: hr, lr [B,H,W,C] NHWC in [0,1],
    plus ctc_labels/ctc_lengths/weighted_tics for the cascade path.
    """
    t = config.TRAIN
    crit = _image_crit(spec.crit, bool(args.get("gradient", False)))
    stu_iter = int(args.get("stu_iter", 1))
    sr_share = bool(args.get("sr_share", False))
    tpg_share = bool(args.get("tpg_share", False))
    use_label = bool(args.get("use_label", False))
    use_distill = bool(args.get("use_distill", False))
    use_ssim = bool(args.get("ssim_loss", False))
    in_ch = spec.in_channels
    cw = _crnn_width(int(t.get("width", 128)))
    tx = make_optimizer(float(t.get("lr", 1e-3)), float(t.get("beta1", 0.5)))

    is_cascade = arch in ABLATION_SET
    is_tl_simple = arch in TL_SIMPLE
    want_mask = bool(args.get("mask", False))
    # TRAIN.compute_dtype: 'bf16' runs the models in bfloat16 (params stay
    # fp32; layers cast weights to the activation dtype) with fp32 losses
    compute_dtype = (
        jnp.bfloat16 if str(t.get("compute_dtype", "fp32")) == "bf16" else jnp.float32
    )

    def loss_fn(trainable, state: TrainState, batch) -> Tuple[jax.Array, Dict]:
        sr_params, stu_params = trainable["sr"], trainable["stu"]
        sr_stats = list(state.sr_stats)
        stu_stats = list(state.stu_stats)
        hr = _as_image(_ensure_mask(batch["hr"], want_mask), compute_dtype)
        lr = _as_image(_ensure_mask(batch["lr"], want_mask), compute_dtype)
        metrics: Dict[str, jax.Array] = {}

        if is_cascade or is_tl_simple:
            # frozen teacher prior from HR (super_resolution.py:297-299)
            teach_logits, _ = _apply(
                stu_model, state.teacher_params, state.teacher_stats,
                (parse_crnn_data(hr, cw),), train=False,
            )
            label_vecs_hr = jax.nn.softmax(
                jax.lax.stop_gradient(teach_logits).astype(jnp.float32), -1
            )

            loss_img = 0.0
            loss_recog = 0.0
            cascade_images = lr
            n_stage = stu_iter if is_cascade else 1
            for i in range(n_stage):
                tp = 0 if tpg_share else i
                stu_in = parse_crnn_data(cascade_images, cw)
                stu_logits, stu_stats[tp] = _apply(
                    stu_model, stu_params[tp], stu_stats[tp], (stu_in,), train=True
                )
                stu_logits = stu_logits.astype(jnp.float32)  # fp32 CTC/softmax
                label_vecs = jax.nn.softmax(stu_logits, -1)

                if is_cascade and use_label:
                    per = ctc_loss(stu_logits, batch["ctc_labels"], batch["ctc_lengths"])
                    loss_recog = loss_recog + jnp.mean(per * batch["weighted_tics"])
                if (is_cascade and use_distill) or is_tl_simple:
                    loss_recog = loss_recog + L.semantic_loss(label_vecs, label_vecs_hr) * 100.0

                prior = logits_to_prior(stu_logits)
                if is_cascade:
                    prior = prior_dropout_first_quarter(prior)

                pick = 0 if sr_share else i
                sr_apply = functools.partial(_apply, sr_model)
                if is_cascade and n_stage > 1:
                    # remat each SR stage: cascade grads flow end-to-end
                    sr_apply = jax.checkpoint(sr_apply, static_argnums=(3,))
                # image input/target sliced to the arch's channel count
                # (no-op for the 4-channel TSRN-family; esrgan_tl is 3-ch)
                sr_out, sr_stats[pick] = sr_apply(
                    sr_params[pick], sr_stats[pick],
                    (lr[..., :in_ch], prior.astype(compute_dtype)), True,
                )
                hr_t = hr[..., :in_ch].astype(jnp.float32)
                loss_img_each = crit(sr_out.astype(jnp.float32), hr_t) * 100.0
                loss_img = loss_img + loss_img_each
                if use_ssim:
                    loss_img = loss_img + (
                        1.0 - ssim(sr_out.astype(jnp.float32), hr_t)
                    ) * 10.0
                cascade_images = sr_out
                metrics[f"loss_img_{i}"] = loss_img_each

            loss = loss_img + loss_recog
            metrics["loss_img"] = jnp.asarray(loss_img)
            metrics["loss_distill"] = jnp.asarray(loss_recog)
        elif arch == "tsrn_c2f":
            # image_sr, image_coar = model(lr); loss = img*100 + coarse*100
            # (super_resolution.py:250-257, coarse target from the c2f
            # collate's HR/LR pixel average)
            (sr_out, coarse), sr_stats[0] = _apply(
                sr_model, sr_params[0], sr_stats[0], (lr[..., :in_ch],), train=True
            )
            loss_img = crit(
                sr_out.astype(jnp.float32), hr[..., :in_ch].astype(jnp.float32)
            ) * 100.0
            loss_coar = crit(
                coarse.astype(jnp.float32),
                _as_image(batch["coarse"], jnp.float32)[..., : coarse.shape[-1]],
            ) * 100.0
            loss = loss_img + loss_coar
            metrics["loss_img"] = loss_img
            metrics["loss_distill"] = jnp.zeros(())
        elif arch == "sem_tsrn":
            # image_sr, pred_vecs = model(lr, word_vec); only the image loss
            # contributes — the reference's semantic term is a dead 0
            # (super_resolution.py:235-247, loss_sem_cal = 0.)
            (sr_out, _vecs), sr_stats[0] = _apply(
                sr_model, sr_params[0], sr_stats[0],
                (lr[..., :in_ch], batch.get("w2v")), train=True,
            )
            loss = crit(
                sr_out.astype(jnp.float32), hr[..., :in_ch].astype(jnp.float32)
            ) * 100.0
            metrics["loss_img"] = loss
            metrics["loss_distill"] = jnp.zeros(())
        else:
            sr_out, sr_stats[0] = _apply(
                sr_model, sr_params[0], sr_stats[0], (lr[..., :in_ch],), train=True
            )
            if isinstance(sr_out, tuple):
                sr_out = sr_out[0]
            loss = crit(
                sr_out.astype(jnp.float32), hr[..., :in_ch].astype(jnp.float32)
            ) * 100.0
            metrics["loss_img"] = loss
            metrics["loss_distill"] = jnp.zeros(())

        metrics["loss_total"] = loss
        return loss, (metrics, tuple(sr_stats), tuple(stu_stats))

    def train_step(state: TrainState, batch):
        (loss, (metrics, sr_stats, stu_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable, state, batch)
        grads = clip_sr_grads(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        new = jax.tree_util.tree_map(
            lambda p, u: p + u, state.trainable, updates
        )
        return (
            state.replace(
                step=state.step + 1,
                sr_params=tuple(new["sr"]),
                stu_params=tuple(new["stu"]),
                sr_stats=sr_stats,
                stu_stats=stu_stats,
                opt_state=opt_state,
            ),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    arch: str,
    spec: ArchSpec,
    sr_model,
    stu_model,
    args,
    config,
    with_recognizer: bool = True,
    eval_rec=None,
):
    """Jitted eval step: cascade inference in eval mode + metrics.

    Returns (sr_images, outs) where outs holds per-batch PSNR/SSIM sums and
    (optionally) eval-recognizer outputs on SR/LR/HR for host-side
    decode+accuracy — mirroring TextSR.eval (super_resolution.py:540-1347).

    ``eval_rec``: optional (kind, model, variables) for a non-CRNN eval
    recognizer from the test_bible (super_resolution.py:107-135):
      * kind='ASTER': input bicubic 32x128 RGB scaled to [-1,1]
        (parse_aster_data, base.py:844-864); output beam-searched ids.
      * kind='MORAN': input bicubic 32x100 grayscale (parse_moran_data,
        base.py:608-632); output 20-step L2R logits.
      * kind='SEED': input bicubic 32x100 RGB in [-1,1] (parse_SEED_data,
        base.py:720-756); output beam-searched ids.  (Dead/NameError path in
        the reference — functional here.)
    The default (None) evaluates with the frozen teacher CRNN.
    """
    t = config.TRAIN
    stu_iter = int(args.get("stu_iter", 1))
    sr_share = bool(args.get("sr_share", False))
    tpg_share = bool(args.get("tpg_share", False))
    in_ch = spec.in_channels
    cw = _crnn_width(int(t.get("width", 128)))
    is_tl = arch in ABLATION_SET or arch in TL_SIMPLE

    if eval_rec is not None:
        rec_kind, rec_model, rec_vars = eval_rec
    else:
        rec_kind, rec_model, rec_vars = "CRNN", None, None

    def recognize(state: TrainState, img):
        """Run the eval recognizer on [B,H,W,C] images in [0,1]."""
        if rec_kind == "ASTER":
            x = interpolate_bicubic(img[..., :3], (32, 128)) * 2.0 - 1.0
            out = rec_model.apply(rec_vars, x, train=False)
            return out["output"]["pred_rec"]  # [B, max_len] ids
        if rec_kind == "SEED":
            from tpgsr_tpu.models.seed import parse_seed_data

            out = rec_model.apply(rec_vars, parse_seed_data(img), train=False)
            return out["output"]["pred_rec"]  # [B, max_len] ids
        if rec_kind == "MORAN":
            x = parse_crnn_data(img, 100)  # same bicubic 32x100 + gray
            l2r, _ = rec_model.apply(rec_vars, x, train=False)
            return l2r  # [B, 20, nclass]
        if rec_model is not None:
            # explicit CRNN eval recognizer: used when the teacher TPG is
            # NOT the eval CRNN (--tpg=OPT; CRNN_init at
            # super_resolution.py:109-116 is independent of the TPG choice)
            return rec_model.apply(rec_vars, parse_crnn_data(img, cw), train=False)
        logits, _ = _apply(
            stu_model, state.teacher_params, state.teacher_stats,
            (parse_crnn_data(img, cw),), train=False,
        )
        return logits

    want_mask = bool(args.get("mask", False))

    def eval_step(state: TrainState, batch):
        hr = _as_image(_ensure_mask(batch["hr"], want_mask), jnp.float32)
        lr = _as_image(_ensure_mask(batch["lr"], want_mask), jnp.float32)
        outs: Dict[str, Any] = {}
        sr_list = []
        if is_tl:
            cascade_images = lr
            n_stage = stu_iter if arch in ABLATION_SET else 1
            for i in range(n_stage):
                tp = 0 if tpg_share else i
                stu_logits, _ = _apply(
                    stu_model, state.stu_params[tp], state.stu_stats[tp],
                    (parse_crnn_data(cascade_images, cw),), train=False,
                )
                prior = logits_to_prior(stu_logits)
                pick = 0 if sr_share else i
                sr_out, _ = _apply(
                    sr_model, state.sr_params[pick], state.sr_stats[pick],
                    (lr[..., :in_ch], prior), train=False,
                )
                cascade_images = sr_out
                sr_list.append(sr_out)
        else:
            sr_out, _ = _apply(
                sr_model, state.sr_params[0], state.sr_stats[0],
                (lr[..., :in_ch],), train=False,
            )
            if isinstance(sr_out, tuple):  # tsrn_c2f / sem_tsrn aux outputs
                sr_out = sr_out[0]
            sr_list.append(sr_out)

        sr = sr_list[-1]
        # per-sample metrics so the host can mask padded rows (the final
        # partial batch is padded to the full batch size — one compile)
        diff = (sr[..., :3] - hr[..., :3]) * 255.0
        outs["mse"] = jnp.mean(diff * diff, axis=(1, 2, 3))
        # cal_ssim runs on the FULL tensors (mask channel included for the
        # 4-channel archs) while cal_psnr slices to RGB internally
        # (super_resolution.py:974-975, utils/ssim_psnr.py:9-15,61-66)
        outs["ssim"] = ssim(sr, hr[..., : sr.shape[-1]], size_average=False)
        can_recognize = (rec_kind != "CRNN" or rec_model is not None
                         or state.teacher_params is not None)
        if with_recognizer and can_recognize:
            for name, img in (("sr", sr), ("lr", lr), ("hr", hr)):
                outs[f"logits_{name}"] = recognize(state, img)
            # per-stage outputs for cascade counters (super_resolution.py:1127)
            for i, s in enumerate(sr_list[:-1]):
                outs[f"logits_stage{i}"] = recognize(state, s)
        return sr, outs

    # Large eval batches (YAML default TRAIN.batch_size=512) run per-tile:
    # XLA's batch-in-lanes conv layouts make the flat large batch ~1.8x
    # slower per image (ops/tiling.py docstring; measured 6.8k -> 11.0k
    # img/s at batch 512).  Outputs are per-sample, so results are
    # identical (tests/test_train.py::test_eval_step_tiled_equivalence).
    # eval_tile is PER-DEVICE: under a data mesh the global batch is already
    # split n_devices ways, so the lax.map tile must scale with the mesh or
    # an 8-chip eval would serialize tiles that each underfill the chips.
    tile = int(t.get("eval_tile", tiling.DEFAULT_TILE) or 0) * jax.device_count()

    def tiled_eval_step(state: TrainState, batch):
        arrays = {k: v for k, v in batch.items() if hasattr(v, "shape")}
        b = arrays["hr"].shape[0]
        if not tile or b <= tile or b % tile:
            return eval_step(state, arrays)
        shaped = {k: v.reshape(b // tile, tile, *v.shape[1:])
                  for k, v in arrays.items()}
        sr, outs = jax.lax.map(lambda tb: eval_step(state, tb), shaped)

        def merge(key, x):
            # CRNN logits are time-major [T, B, C] (torch CRNN convention);
            # everything else is batch-leading per-sample
            if key.startswith("logits_") and rec_kind == "CRNN":
                g, tt, n = x.shape[0], x.shape[1], x.shape[2]
                return jnp.moveaxis(x, 0, 1).reshape(tt, g * n, *x.shape[3:])
            return x.reshape(b, *x.shape[2:])

        return merge("", sr), {k: merge(k, v) for k, v in outs.items()}

    return jax.jit(tiled_eval_step)
