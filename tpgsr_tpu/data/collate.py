"""Batch assembly ("collate") functions producing fixed-shape numpy arrays.

Parity targets (dataset/dataset.py):
  * ``collate_real``      == ``alignCollate_real`` (:1139-1152)
  * ``collate_real_wtl``  == ``alignCollate_realWTL`` (:1155-1223) — val
    collate for TL archs; includes the reference's intentional ``word[2]='e'``
    corruption of words longer than 4 chars (:1176-1179), which only affects
    the (unused-for-accuracy) one-hot tensor.
  * ``collate_real_wtl_amask`` == ``alignCollate_realWTLAMask`` (:1226-1323)
    — train collate for TL archs: adds CTC labels (+blank-fallback one-hot
    and ``weighted_tics`` 0/1 has-label flags).
  * ``collate_syn``       == ``alignCollate_syn`` (:901-992) — HR from the
    single image, LR by PIL-bicubic downsample.

XLA needs static shapes, so unlike the reference's per-batch ``max_len``
one-hot tensor we pad the prior-label tensor to a fixed ``prior_len`` (26 —
the CRNN sequence length) and CTC labels to ``max_label_len`` (15, the
reference's WTLAMask truncation).  Arrays are NHWC; the prior tensor is
[B, 1, T, n_classes] (reference: [B, C, 1, T]).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image

from tpgsr_tpu.charset import CTC_CHAR_TO_ID, CTC_NUM_CLASSES
from tpgsr_tpu.data.transforms import pil_downsample, resize_normalize


@dataclass(frozen=True)
class CollateConfig:
    imgH: int = 32
    imgW: int = 128
    down_sample_scale: int = 2
    mask: bool = False
    prior_len: int = 26  # static pad of the one-hot label tensor
    max_label_len: int = 15  # WTLAMask truncation (dataset.py:1282)
    train: bool = True
    keep_ratio: bool = False  # aspect-preserving center-pad resize
    # "uint8" ships images pre-normalization (mask channel {0,255}) — 4x less
    # host->device transfer; the jitted steps divide by 255 on device, which
    # is bit-identical (PIL decodes to uint8 either way).
    wire_dtype: str = "float32"
    # Cache each image's TRANSFORMED array (resize+convert+mask) on the PIL
    # Image object itself.  resize_normalize is a deterministic function of
    # the image, and with the decode RAM cache on (TRAIN.cache_images) the
    # same Image objects recur every epoch — epochs 2+ then skip all per-
    # image work and the collate reduces to np.stack + label tensors (the
    # measured host bottleneck of end-to-end training on a 1-core host,
    # docs/perf_notes.md).  Value-identical by construction; a cache-off
    # run is byte-equal (tested).  With the decode cache off the Image
    # objects are fresh each epoch and this is a per-batch no-op.
    cache_transformed: bool = True
    # Ship hr/lr as 3-channel RGB and let the jitted steps append the 4th
    # contour-mask channel on device (ops.image.append_contour_mask_u8 —
    # bit-identical integer math, tested byte-equal).  Cuts the transfer-
    # bound train wire by ~20% on tunneled TPUs.  Only takes effect on the
    # uint8 wire with mask on; the trainer enables it.
    device_mask: bool = False


def _xformed(img: Image.Image, size, mask: bool, u8: bool, cache: bool) -> np.ndarray:
    if not cache:
        return resize_normalize(img, size, mask, as_uint8=u8)
    key = (size, mask, u8)
    store = getattr(img, "_tpgsr_xform", None)
    if store is None:
        store = {}
        try:
            img._tpgsr_xform = store
        except AttributeError:  # exotic image types without __dict__
            return resize_normalize(img, size, mask, as_uint8=u8)
    arr = store.get(key)
    if arr is None:
        arr = resize_normalize(img, size, mask, as_uint8=u8)
        arr.setflags(write=False)  # shared across epochs: freeze it
        store[key] = arr
    return arr


def _stack_pairs(batch, cfg: CollateConfig) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    hrs, lrs, labels = [], [], []
    lr_size = (cfg.imgW // cfg.down_sample_scale, cfg.imgH // cfg.down_sample_scale)
    hr_size = (cfg.imgW, cfg.imgH)
    u8 = cfg.wire_dtype == "uint8" and not cfg.keep_ratio
    # device_mask: the steps append the mask channel on device (bit-exact),
    # so the wire ships plain RGB
    want_mask = cfg.mask and not (u8 and cfg.device_mask)
    for item in batch:
        img_hr, img_lr, label = item[0], item[1], item[2]
        if cfg.keep_ratio:
            from tpgsr_tpu.data.transforms import resize_normalize_keep_ratio

            hr_arr, _ = resize_normalize_keep_ratio(img_hr, hr_size, cfg.mask)
            lr_arr, _ = resize_normalize_keep_ratio(img_lr, lr_size, cfg.mask)
        else:
            hr_arr = _xformed(img_hr, hr_size, want_mask, u8, cfg.cache_transformed)
            lr_arr = _xformed(img_lr, lr_size, want_mask, u8, cfg.cache_transformed)
        hrs.append(hr_arr)
        lrs.append(lr_arr)
        labels.append(label)
    return np.stack(hrs), np.stack(lrs), labels


def collate_real(batch, cfg: CollateConfig) -> Dict:
    hr, lr, labels = _stack_pairs(batch, cfg)
    return {"hr": hr, "lr": lr, "labels": labels}


def _onehot_rows(word: str) -> np.ndarray:
    ids = [CTC_CHAR_TO_ID[ch] for ch in word if ch in CTC_CHAR_TO_ID]
    vec = np.zeros((len(ids), CTC_NUM_CLASSES), np.float32)
    if ids:
        vec[np.arange(len(ids)), ids] = 1.0
    return vec


def collate_real_wtl(batch, cfg: CollateConfig) -> Dict:
    hr, lr, labels = _stack_pairs(batch, cfg)
    b = len(labels)
    label_vecs = np.zeros((b, 1, cfg.prior_len, CTC_NUM_CLASSES), np.float32)
    for i, word in enumerate(labels):
        word = word.lower()
        if len(word) > 4:
            word = word[:2] + "e" + word[3:]  # reference quirk (dataset.py:1176-1179)
        word = word[: cfg.prior_len]
        rows = _onehot_rows(word)
        label_vecs[i, 0, : rows.shape[0]] = rows
    return {"hr": hr, "lr": lr, "labels": labels, "label_vecs": label_vecs}


def collate_real_wtl_amask(batch, cfg: CollateConfig) -> Dict:
    hr, lr, labels = _stack_pairs(batch, cfg)
    b = len(labels)
    label_vecs = np.zeros((b, 1, cfg.prior_len, CTC_NUM_CLASSES), np.float32)
    ctc_labels = np.zeros((b, cfg.max_label_len), np.int32)
    ctc_lengths = np.zeros((b,), np.int32)
    weighted_tics = np.zeros((b,), np.float32)
    for i, word in enumerate(labels):
        word = word.lower()[: cfg.max_label_len]
        ids = [CTC_CHAR_TO_ID[ch] for ch in word if ch in CTC_CHAR_TO_ID]
        if ids:
            rows = _onehot_rows(word)
            label_vecs[i, 0, : rows.shape[0]] = rows
            ctc_labels[i, : len(ids)] = ids
            ctc_lengths[i] = len(ids)
            weighted_tics[i] = 1.0
        else:
            # blank-label fallback (dataset.py:1305-1310)
            label_vecs[i, 0, 0, 0] = 1.0
            weighted_tics[i] = 0.0
    return {
        "hr": hr,
        "lr": lr,
        "labels": labels,
        "label_vecs": label_vecs,
        "ctc_labels": ctc_labels,
        "ctc_lengths": ctc_lengths,
        "weighted_tics": weighted_tics,
    }


def collate_syn(batch, cfg: CollateConfig) -> Dict:
    """Synthetic: HR = image; LR = bicubic /scale then transform."""
    hrs, lrs, labels = [], [], []
    for item in batch:
        img, label = item[0], item[-1]
        hrs.append(resize_normalize(img, (cfg.imgW, cfg.imgH), cfg.mask))
        lr_img = pil_downsample(img, cfg.down_sample_scale)
        lrs.append(
            resize_normalize(
                lr_img,
                (cfg.imgW // cfg.down_sample_scale, cfg.imgH // cfg.down_sample_scale),
                cfg.mask,
            )
        )
        labels.append(label)
    return {"hr": np.stack(hrs), "lr": np.stack(lrs), "labels": labels}


COLLATES = {
    "real": collate_real,
    "realWTL": collate_real_wtl,
    "realWTLAMask": collate_real_wtl_amask,
    "syn": collate_syn,
}


def collate_syn_random_reso(batch, cfg: CollateConfig):
    """``alignCollate_syn_random_reso`` (dataset.py:996-1089): NO resize —
    per-image arrays at native resolution; HR is the image bicubic-upscaled
    x2.  Returns lists (variable shapes; the --random_reso eval path pads or
    buckets before jit)."""
    from tpgsr_tpu.data.transforms import normalize

    hrs, lrs, labels = [], [], []
    for item in batch:
        img, label = item[0], item[-1] if isinstance(item[-1], str) else item[2]
        up = img.resize((img.size[0] * 2, img.size[1] * 2), Image.BICUBIC)
        hrs.append(normalize(up, cfg.mask)[None])
        lrs.append(normalize(img, cfg.mask)[None])
        labels.append(label)
    return {"hr_list": hrs, "lr_list": lrs, "labels": labels}


def _dash_padded_onehot(word: str, prior_len: int, noise_rng=None) -> np.ndarray:
    """The withcrop collate's label spreading (dataset.py:1360-1393): words
    of length 2..25 are spread to ~26 chars by inserting '-' runs between
    characters, then one-hot encoded; uniform(-0.1, 0.1) noise added."""
    word = word.lower()
    if len(word) > 4:
        word = word[:2] + "e" + word[3:]
    if len(word) <= 1:
        pass
    elif len(word) < prior_len:
        padding = (prior_len - len(word)) // max(len(word) - 1, 1)
        new_word = word[0]
        for ch in word[1:]:
            new_word += "-" * padding + ch
        word = new_word
    else:
        word = word[:prior_len]
    ids = [CTC_CHAR_TO_ID[ch] for ch in word if ch in CTC_CHAR_TO_ID]
    vec = np.zeros((prior_len, CTC_NUM_CLASSES), np.float32)
    if ids:
        vec[np.arange(len(ids)), ids] = 1.0
    return vec


def collate_real_wtl_withcrop(batch, cfg: CollateConfig, rng=None):
    """``alignCollate_realWTL_withcrop`` (dataset.py:1327-1411): crop-jitter
    intervals (a no-op through the reference's resizeNormalizeRandomCrop
    quirk), dash-spread one-hot label prior + uniform noise."""
    rng = rng or np.random.default_rng(0)
    hr, lr, labels = _stack_pairs(batch, cfg)
    b = len(labels)
    label_vecs = np.zeros((b, 1, cfg.prior_len, CTC_NUM_CLASSES), np.float32)
    for i, word in enumerate(labels):
        label_vecs[i, 0] = _dash_padded_onehot(word, cfg.prior_len)
    label_vecs += (rng.random(label_vecs.shape).astype(np.float32) - 0.5) * 0.2
    return {"hr": hr, "lr": lr, "labels": labels, "label_vecs": label_vecs}


def collate_c2f_real(batch, cfg: CollateConfig):
    """``alignCollatec2f_real`` (dataset.py:1447-1482): adds the HR/LR pixel
    average as a coarse target at LR size (tsrn_c2f's auxiliary output)."""
    hr, lr, labels = _stack_pairs(batch, cfg)
    mx = []
    for img_hr, img_lr, _ in batch:
        a = np.asarray(img_hr.convert("RGB"), np.float32)
        b_ = np.asarray(img_lr.resize(img_hr.size).convert("RGB"), np.float32)
        from PIL import Image as _I

        mid = _I.fromarray(((a + b_) / 2.0).astype(np.uint8))
        mx.append(
            resize_normalize(
                mid,
                (cfg.imgW // cfg.down_sample_scale, cfg.imgH // cfg.down_sample_scale),
                cfg.mask,
            )
        )
    return {"hr": hr, "lr": lr, "labels": labels, "coarse": np.stack(mx)}


def collate_w2v_real(batch, cfg: CollateConfig):
    """``alignCollateW2V_real`` (dataset.py:1414-1444): the FastText hook is
    effectively disabled in the reference (import commented); zero word
    vectors of the documented width (300) keep the sem_tsrn interface."""
    hr, lr, labels = _stack_pairs(batch, cfg)
    w2v = np.zeros((len(labels), 300), np.float32)
    return {"hr": hr, "lr": lr, "labels": labels, "w2v": w2v}


COLLATES.update(
    {
        "syn_random_reso": collate_syn_random_reso,
        "realWTL_withcrop": collate_real_wtl_withcrop,
        "c2f_real": collate_c2f_real,
        "W2V_real": collate_w2v_real,
    }
)
