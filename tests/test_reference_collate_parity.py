"""Value-level parity of the canonical collates vs the reference's own
``dataset/dataset.py`` collate classes (run under torch-CPU at test time).

Closes the last unverified link in the train-step input chain: round 1 only
shape-smoked the collates; here the actual tensors (images incl. the
binarized mask channel, one-hot prior, CTC label stream, weighted_tics)
are compared element-for-element on the same PIL images.

Layout notes: the reference returns NCHW tensors and a per-batch
``max_len`` one-hot prior [B, C, 1, L]; we return NHWC and a fixed
``prior_len``=26 (static shapes for XLA) — compared over the overlapping
region with the padding asserted zero.  The reference's WTLAMask CTC
targets are a single concatenated 1-D stream (dataset.py:1296-1300); ours
are padded [B, 15] rows + lengths — compared after re-concatenation.
"""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from tests.reference_loader import load_reference_module, reference_available
from tpgsr_tpu.data.collate import (
    CollateConfig,
    collate_real,
    collate_real_wtl,
    collate_real_wtl_amask,
    collate_syn,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

WORDS = ["hello", "WORLD", "ab", "x", "longerword123", "!!!", "the"]


def _images(rng, n, hr_size=(128, 32), lr_size=(64, 16), jitter=True):
    """Random PIL image pairs at TextZoom-ish (varied) native sizes."""
    pairs = []
    for i in range(n):
        if jitter:
            hw = (hr_size[0] + 7 * (i % 3), hr_size[1] + 3 * (i % 2))
            lw = (lr_size[0] - 5 * (i % 2), lr_size[1] + 2 * (i % 3))
        else:
            hw, lw = hr_size, lr_size
        hr = Image.fromarray(rng.integers(0, 256, (hw[1], hw[0], 3), dtype=np.uint8), "RGB")
        lr = Image.fromarray(rng.integers(0, 256, (lw[1], lw[0], 3), dtype=np.uint8), "RGB")
        pairs.append((hr, lr))
    return pairs


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def ref_ds():
    return load_reference_module("dataset.dataset")


@pytest.fixture
def cfg():
    return CollateConfig(imgH=32, imgW=128, down_sample_scale=2, mask=True)


def test_collate_real_value_parity(ref_ds, cfg, rng):
    pairs = _images(rng, len(WORDS))
    # alignCollate_real unpacks 4-tuples (dataset.py:1141)
    batch_ref = [(hr, lr, w, 0) for (hr, lr), w in zip(pairs, WORDS)]
    ref_hr, ref_lr, ref_labels, _ = ref_ds.alignCollate_real(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)

    ours = collate_real(batch_ref, cfg)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)
    assert list(ours["labels"]) == list(ref_labels)


def test_collate_real_wtl_value_parity(ref_ds, cfg, rng):
    pairs = _images(rng, len(WORDS))
    batch_ref = [(hr, lr, w) for (hr, lr), w in zip(pairs, WORDS)]
    ref_hr, ref_lr, _, ref_vecs = ref_ds.alignCollate_realWTL(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)

    ours = collate_real_wtl(batch_ref, cfg)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)

    # reference prior: [B, alsize, 1, max_len] -> ours [B, 1, 26, alsize]
    ref_prior = ref_vecs.numpy().transpose(0, 2, 3, 1)  # [B, 1, max_len, alsize]
    L = ref_prior.shape[2]
    np.testing.assert_allclose(ours["label_vecs"][:, :, :L, :], ref_prior, atol=0)
    assert not ours["label_vecs"][:, :, L:, :].any()


def test_collate_real_wtl_amask_value_parity(ref_ds, cfg, rng):
    pairs = _images(rng, len(WORDS))
    batch_ref = [(hr, lr, w) for (hr, lr), w in zip(pairs, WORDS)]
    out = ref_ds.alignCollate_realWTLAMask(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)
    ref_hr, ref_lr, _, ref_vecs, ref_ctc_stream, ref_tics = out

    ours = collate_real_wtl_amask(batch_ref, cfg)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)

    ref_prior = ref_vecs.numpy().transpose(0, 2, 3, 1)
    L = ref_prior.shape[2]
    np.testing.assert_allclose(ours["label_vecs"][:, :, :L, :], ref_prior, atol=0)

    np.testing.assert_array_equal(ours["weighted_tics"], ref_tics.numpy())
    # our padded [B,15]+lengths rows re-concatenated == the reference's 1-D
    # stream (empty-vocab words contribute a single 0 there, len 0 here)
    my_stream = []
    for row, n, tic in zip(ours["ctc_labels"], ours["ctc_lengths"], ours["weighted_tics"]):
        my_stream.extend(row[:n].tolist() if tic else [0])
    np.testing.assert_array_equal(np.array(my_stream), ref_ctc_stream.numpy())


def test_collate_syn_value_parity(ref_ds, cfg, rng):
    pairs = _images(rng, len(WORDS))
    # syn batch items are 4-tuples (img, _, label, identity) fed from
    # lmdbDataset_mix (dataset.py:954); LR is recomputed from HR
    batch_ref = [(hr, hr, w, 0) for (hr, _), w in zip(pairs, WORDS)]
    ref_hr, ref_lr, _, _ = ref_ds.alignCollate_syn(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)

    batch_mine = [(hr, w) for (hr, _), w in zip(pairs, WORDS)]
    ours = collate_syn(batch_mine, cfg)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)


# ---------------------------------------------------------------------------
# Long-tail (ablation-path) collates — value parity vs the reference's own
# classes.  These were only shape-smoked in round 1.
# ---------------------------------------------------------------------------


def test_collate_random_reso_value_parity(ref_ds, cfg, rng):
    """alignCollate_syn_random_reso (dataset.py:996-1089): all randomness is
    commented out in the reference — HR is the native image bicubic-upscaled
    x2, LR the native image, both ToTensor'd WITHOUT resizing (Normalize,
    dataset.py:635-652).  Per-image variable shapes, so outputs are lists."""
    from tpgsr_tpu.data.collate import collate_syn_random_reso

    pairs = _images(rng, len(WORDS))
    batch_ref = [(hr, hr, w, 0) for (hr, _), w in zip(pairs, WORDS)]
    ref_hr, ref_lr, ref_labels, _ = ref_ds.alignCollate_syn_random_reso(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)

    ours = collate_syn_random_reso(batch_ref, cfg)
    assert ours["labels"] == list(ref_labels)
    for mine_hr, mine_lr, r_hr, r_lr in zip(
        ours["hr_list"], ours["lr_list"], ref_hr, ref_lr
    ):
        np.testing.assert_allclose(mine_hr, _nhwc(r_hr), atol=1e-6)
        np.testing.assert_allclose(mine_lr, _nhwc(r_lr), atol=1e-6)


def test_collate_withcrop_value_parity(ref_ds, cfg, rng):
    """alignCollate_realWTL_withcrop (dataset.py:1327-1411).  The random crop
    interval hits resizeNormalizeRandomCrop's plain-resize branch (a non-None
    interval short-circuits the crop, dataset.py:666-668), so the images are
    deterministic.  The dash-spread one-hot prior gets uniform(-0.1,0.1)
    torch.rand noise — replicated here under the same torch seed (the collate
    makes exactly one torch.rand call) and subtracted for the comparison."""
    import random as pyrandom

    import torch

    from tpgsr_tpu.data.collate import collate_real_wtl_withcrop

    pairs = _images(rng, len(WORDS))
    batch_ref = [(hr, lr, w) for (hr, lr), w in zip(pairs, WORDS)]
    pyrandom.seed(7)
    torch.manual_seed(7)
    ref_hr, ref_lr, ref_labels, ref_vecs = ref_ds.alignCollate_realWTL_withcrop(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)
    torch.manual_seed(7)
    noise = (torch.rand(ref_vecs.shape) - 0.5) * 0.2
    ref_clean = (ref_vecs - noise).numpy().transpose(0, 2, 3, 1)  # [B,1,maxL,C]

    class _ZeroNoise:  # rng.random(shape) == 0.5 -> (0.5-0.5)*0.2 == 0 noise
        def random(self, shape):
            return np.full(shape, 0.5, np.float32)

    ours = collate_real_wtl_withcrop(batch_ref, cfg, rng=_ZeroNoise())
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)
    assert list(ours["labels"]) == list(ref_labels)

    L = ref_clean.shape[2]  # per-batch max spread length (<= prior_len 26)
    np.testing.assert_allclose(
        ours["label_vecs"][:, :, :L, :], ref_clean, atol=1e-6
    )
    assert not ours["label_vecs"][:, :, L:, :].any()


def test_collate_c2f_value_parity(ref_ds, cfg, rng):
    """alignCollatec2f_real (dataset.py:1447-1482): coarse target is the
    uint8-rounded HR/LR pixel average, transformed at LR size.  The reference
    averages the native arrays directly, so it only functions when the pair
    shares one size (TextZoom native pairs would broadcast-error); same-size
    pairs are used here.  Our collate also accepts mismatched pairs (LR is
    bicubic-upscaled to HR size first)."""
    from tpgsr_tpu.data.collate import collate_c2f_real

    pairs = _images(rng, len(WORDS), hr_size=(128, 32), lr_size=(128, 32), jitter=False)
    batch_ref = [(hr, lr, w) for (hr, lr), w in zip(pairs, WORDS)]
    ref_hr, ref_lr, ref_labels, ref_mx = ref_ds.alignCollatec2f_real(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)

    ours = collate_c2f_real(batch_ref, cfg)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)
    np.testing.assert_allclose(ours["coarse"], _nhwc(ref_mx), atol=1e-6)
    assert list(ours["labels"]) == list(ref_labels)

    # mixed-size pairs: the reference broadcast-errors, ours works
    mixed = _images(rng, 2)  # HR 128x32-ish, LR 64x16-ish
    batch_mixed = [(hr, lr, w) for (hr, lr), w in zip(mixed, WORDS)]
    with pytest.raises(ValueError):
        ref_ds.alignCollatec2f_real(
            imgH=32, imgW=128, down_sample_scale=2, mask=True
        )(batch_mixed)
    out = collate_c2f_real(batch_mixed, cfg)
    assert out["coarse"].shape == (2, 16, 64, 4)


def test_collate_w2v_dead_path_and_intended_semantics(ref_ds, cfg, rng):
    """alignCollateW2V_real (dataset.py:1414-1444) is DEAD in the reference:
    it calls ``transform2(img, label_str)`` but resizeNormalize.__call__
    takes a single image (dataset.py:615-632) -> TypeError on every batch.
    Ours implements the intended semantics (resizeNormalize images + the
    disabled-FastText zero word vectors, sem_tsrn's interface)."""
    from tpgsr_tpu.data.collate import collate_w2v_real

    pairs = _images(rng, len(WORDS))
    batch_ref = [(hr, lr, w, None) for (hr, lr), w in zip(pairs, WORDS)]
    with pytest.raises(TypeError):
        ref_ds.alignCollateW2V_real(
            imgH=32, imgW=128, down_sample_scale=2, mask=True
        )(batch_ref)

    ours = collate_w2v_real(batch_ref, cfg)
    # intended image semantics == the working alignCollate_real path
    ref_hr, ref_lr, _, _ = ref_ds.alignCollate_real(
        imgH=32, imgW=128, down_sample_scale=2, mask=True
    )(batch_ref)
    np.testing.assert_allclose(ours["hr"], _nhwc(ref_hr), atol=1e-6)
    np.testing.assert_allclose(ours["lr"], _nhwc(ref_lr), atol=1e-6)
    assert ours["w2v"].shape == (len(WORDS), 300) and not ours["w2v"].any()
