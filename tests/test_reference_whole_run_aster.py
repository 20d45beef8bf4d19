"""WHOLE-RUN parity with a NON-CRNN eval recognizer (VERDICT r3 item 9).

Same harness as tests/test_reference_whole_run.py (the reference's own
``interfaces/super_resolution.py`` TextSR driven in place through the lmdb
shim, identical initial weights, chaos-envelope control), but with
``--test_model=ASTER``: the eval ``test_bible`` entry is the ASTER
recognizer (super_resolution.py:118-125 — ``Aster_init`` from
``TRAIN.VAL.rec_pretrained``, ``parse_aster_data`` input glue
(base.py:844-865: bicubic 32x128 RGB scaled to [-1,1]), and
``get_string_aster`` beam-search decode (utils/metrics.py:20-68)).

This pins the test_bible data_in_fn/string_process composition INSIDE the
full orchestrator for a second recognizer family — the one place eval glue
could still diverge after the CRNN-decode whole-run (e.g. the raw-pred vs
str_filt'd-pred comparison at super_resolution.py:1135-1147, or the
input-range/resize of parse_aster_data).

Both sides load the SAME random-weight ASTER checkpoint (no pretrained
weights exist on this box); half the val labels are rewritten to that
ASTER's own HR predictions through the real reference eval path so accuracy
is a live signal, not a vacuous 0 == 0.

MORAN is driven the same way in tests/test_reference_whole_run_moran.py
(its hardcoded ``inputDataType='torch.cuda.FloatTensor'`` needs one more
scoped shim on top of cpu_cuda_shim — see ``moran_type_shim`` there).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available
from tests.test_reference_whole_run import (
    EPOCHS,
    HD_U,
    N_VAL,
    SPLITS,
    _install_profiler_stubs,
    _render_set,
    _write_lmdb,
    cpu_cuda_shim,
    install_lmdb_shim,
    run_ours,
    run_reference,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

N_TRAIN = 3
ARG_OVER = dict(test_model="ASTER")


def _parse_aster_torch(imgs_nchw):
    """base.py:844-865 restated: bicubic 32x128 on RGB, scaled to [-1,1]."""
    import torch.nn.functional as F

    x = F.interpolate(imgs_nchw[:, :3], (32, 128), mode="bicubic")
    return x * 2.0 - 1.0


def _relabel_with_aster_preds(lmdb_dir, tm_aster, aster_info, metrics_mod,
                              dataset_mod):
    """Rewrite HALF the LMDB's labels to the (random) eval ASTER's HR
    predictions through the real eval input path, so accuracy is live."""
    from tpgsr_tpu.data.lmdb import LMDBReader

    ds = dataset_mod.lmdbDataset_real(root=lmdb_dir, voc_type="all",
                                      max_len=100, test=True)
    coll = dataset_mod.alignCollate_realWTL(
        imgH=32, imgW=128, down_sample_scale=2, mask=True, train=False
    )
    items = [ds[i] for i in range(len(ds))]
    images_hr = coll(items)[0]
    # eval-mode ASTER always beam-searches, which hardcodes .cuda()
    # (attention_recognition_head.py:81-91) — shim it to CPU
    with torch.no_grad(), cpu_cuda_shim():
        out = tm_aster({
            "images": _parse_aster_torch(images_hr),
            "rec_targets": torch.ones(
                images_hr.shape[0], aster_info.max_len, dtype=torch.int32),
            "rec_lengths": [aster_info.max_len] * images_hr.shape[0],
        })
        preds, _ = metrics_mod.get_string_aster(
            out["output"]["pred_rec"],
            torch.ones(images_hr.shape[0], aster_info.max_len,
                       dtype=torch.int32),
            dataset=aster_info,
        )

    r = LMDBReader(lmdb_dir)
    rows = []
    for i in range(len(items)):
        use_pred = i % 2 == 0 and 1 <= len(preds[i]) <= 20
        label = preds[i] if use_pred else items[i][2]
        hr = r.get(b"image_hr-%09d" % (i + 1))
        lr = r.get(b"image_lr-%09d" % (i + 1))
        rows.append((label, hr, lr))
    r.close()
    _write_lmdb(lmdb_dir, rows)


@pytest.fixture(scope="module")
def whole_run_aster(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("whole_run_aster"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")
    tsrn_mod = load_reference_module("model.tsrn")
    base_mod = load_reference_module("interfaces.base")
    rec_mod = load_reference_module("model.recognizer.recognizer_builder")

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    # random-weight reference ASTER, saved the way Aster_init loads it
    # (base.py:831-842: torch.load(rec_pretrained)['state_dict'])
    aster_info = base_mod.AsterInfo("all")
    torch.manual_seed(23)
    tm_aster = rec_mod.RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=aster_info.rec_num_classes,
        sDim=512, attDim=512, max_len_labels=aster_info.max_len,
        eos=aster_info.char2id[aster_info.EOS], STN_ON=True,
    ).eval()
    aster_path = os.path.join(tmp, "aster.pth.tar")
    torch.save({"state_dict": tm_aster.state_dict()}, aster_path)

    torch.manual_seed(11)
    tm_sr = tsrn_mod.TSRN_TL(
        scale_factor=2, width=128, height=32, STN=True, srb_nums=5,
        mask=True, hidden_units=HD_U,
    )
    sr_sd = {k: v.detach().numpy().copy() for k, v in tm_sr.state_dict().items()}
    sr_resume = os.path.join(tmp, "sr_init", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume))
    torch.save({"state_dict_G": tm_sr.state_dict()}, sr_resume)

    sd2 = {k: v.clone() for k, v in tm_sr.state_dict().items()}
    with torch.no_grad():
        sd2["block1.0.weight"] = sd2["block1.0.weight"] + 1e-6
    sr_resume2 = os.path.join(tmp, "sr_init2", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume2))
    torch.save({"state_dict_G": sd2}, sr_resume2)

    train_dir = os.path.join(tmp, "train")
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=21))
    val_dirs = []
    for si, split in enumerate(SPLITS):
        d = os.path.join(tmp, split)
        _write_lmdb(d, _render_set(N_VAL, seed=60 + si))
        _relabel_with_aster_preds(d, tm_aster, aster_info, metrics_mod,
                                  dataset_mod)
        val_dirs.append(d)

    val_over = dict(rec_pretrained=aster_path)
    ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                        arg_over=ARG_OVER, val_over=val_over)
    ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2,
                         arg_over=ARG_OVER, val_over=val_over)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=ARG_OVER, val_over=val_over)
    return ref, ref2, ours


def test_aster_loss_trajectory_unaffected_and_tight(whole_run_aster):
    """The eval recognizer must not perturb training: iter-1 parity at the
    same 5e-6 as the CRNN fixture, full trajectory within the envelope."""
    ref, ref2, ours = whole_run_aster
    assert len(ref["losses"]) == EPOCHS and len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"rel={rel}\nenv={env}\ntol={tol}"


def test_aster_eval_metric_dict_matches(whole_run_aster):
    """Final eval per split with the ASTER test_bible entry: accuracy from
    beam-searched ASTER decode on SR/LR/HR (super_resolution.py:905-925,
    1135-1160), PSNR/SSIM unchanged."""
    ref, ref2, ours = whole_run_aster
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (split, k, r[k], c[k], o[k], tol)


def test_aster_eval_accuracy_is_live(whole_run_aster):
    ref, _, _ = whole_run_aster
    accs = [ref["evals"][s]["accuracy"] for s in SPLITS]
    assert any(a and a > 0 for a in accs), accs
    assert any(a is not None and a < 1.0 for a in accs), accs


def test_aster_best_checkpoint_decision_matches(whole_run_aster):
    ref, _, ours = whole_run_aster
    ref_best = [s["iters"] for s in ref["saved"] if s["is_best"]]
    our_best = [s["iters"] for s in ours["saved"] if s["is_best"]]
    assert ref_best == our_best
