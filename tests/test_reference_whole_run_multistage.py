"""WHOLE-RUN parity for the MULTI-STAGE cascade — the paper's headline
configuration (VERDICT r3 item 2).

Same harness as tests/test_reference_whole_run.py (the reference's own
``interfaces/super_resolution.py`` TextSR driven in place through the lmdb
shim, identical initial weights, chaos-envelope control), but with the
composition the single-stage fixture cannot reach:

  * ``stu_iter=2`` — the ABLATION_SET train loop runs TWO cascade stages
    (super_resolution.py:306-385): stage i's student TPG reads stage i-1's
    SR output while every SR stage consumes images_lr; gradients flow
    through the whole un-detached cascade.
  * ``--tpg_share`` — ONE student TPG serves both stages
    (tpg_pick = 0, :307-310), so its gradient accumulates across stages.
  * ``sr_share`` OFF — separate SR models per stage (pick = i, :342-346),
    both initialised from the SAME resume file (generator_init(i), :87-94),
    each clipped at 0.25 global-norm independently (:422-424).
  * ``--use_label`` — the per-stage CTC loss against the padded label
    tensor, masked by weighted_tics (:347-366).
  * per-stage best-checkpoint surface: the reference saves
    ``model_best_<i>.pth`` per SR stage and ``recognizer_best_<i>.pth`` per
    student entry (base.py:553-585); ours mirrors with
    ``model_best_<i>.msgpack`` / ``recognizer_best_<i>.msgpack``.

Asserted: the full loss trajectory (tight first iterations + chaos
envelope), final eval metric_dict per split (eval cascade composition,
:735-771 — per-stage TPG on cascade_images, accuracy from the LAST stage's
predictions, :1135-1147,1316-1330), is_best decisions, and both sides'
per-stage checkpoint surfaces.
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
    N_TRAIN,
    N_VAL,
    SPLITS,
    _install_profiler_stubs,
    _relabel_with_crnn_preds,
    _render_set,
    _write_lmdb,
    install_lmdb_shim,
    run_ours,
    run_reference,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

STU_ITER = 2
ARG_OVER = dict(stu_iter=STU_ITER, tpg_share=True, sr_share=False)


@pytest.fixture(scope="module")
def whole_run_ms(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("whole_run_ms"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")
    tsrn_mod = load_reference_module("model.tsrn")

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

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
        _write_lmdb(d, _render_set(N_VAL, seed=40 + si))
        _relabel_with_crnn_preds(d, tm_crnn, metrics_mod, dataset_mod)
        val_dirs.append(d)

    ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                        arg_over=ARG_OVER)
    ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2,
                         arg_over=ARG_OVER)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=ARG_OVER, real_save=True)
    return ref, ref2, ours, tmp


def test_ms_loss_first_iterations_tight(whole_run_ms):
    """Iterations 1-3: iter 1 proves the 2-stage loss composition (2x image
    loss + 2x CTC + 2x distill, shared-TPG gradient accumulation); iter 2-3
    prove one-step optimizer/BN updates across BOTH SR stages + the shared
    student."""
    ref, _, ours, _ = whole_run_ms
    assert len(ref["losses"]) == EPOCHS
    assert len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    np.testing.assert_allclose(ours["losses"][1], ref["losses"][1], rtol=1e-4)
    # iter 3: two un-detached cascade stages amplify fp32-accumulation
    # noise ~2x faster than the single-stage fixture (measured 2.4e-3 here
    # vs <1e-3 there); iters 1-2 carry the composition proof and the full
    # trajectory is bounded by the chaos-envelope test below.
    np.testing.assert_allclose(ours["losses"][2], ref["losses"][2], rtol=6e-3)


def test_ms_loss_trajectory_within_chaos_envelope(whole_run_ms):
    ref, ref2, ours, _ = whole_run_ms
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"rel={rel}\nenv={env}\ntol={tol}"


def test_ms_eval_metric_dict_matches(whole_run_ms):
    """Final eval per split: the CASCADE eval composition — per-stage student
    on the previous stage's SR output, SR input always images_lr
    (super_resolution.py:747-770), accuracy counted from the LAST stage's
    predictions (:1135-1147, acc[stu_iter-1] :1316-1330), PSNR/SSIM on
    images_sr[-1] (:974-975)."""
    ref, ref2, ours, _ = whole_run_ms
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (split, k, r[k], c[k], o[k], tol)


def test_ms_eval_accuracy_is_live(whole_run_ms):
    ref, _, _, _ = whole_run_ms
    accs = [ref["evals"][s]["accuracy"] for s in SPLITS]
    assert any(a and a > 0 for a in accs)
    assert any(a is not None and a < 1.0 for a in accs)


def test_ms_best_checkpoint_decision_matches(whole_run_ms):
    ref, _, ours, _ = whole_run_ms
    ref_best = [s["iters"] for s in ref["saved"] if s["is_best"]]
    our_best = [s["iters"] for s in ours["saved"] if s["is_best"]]
    assert ref_best == our_best
    if ref_best:
        r = [s for s in ref["saved"] if s["is_best"]][-1]["best_acc"]
        o = [s for s in ours["saved"] if s["is_best"]][-1]["best_acc"]
        for k, v in r.items():
            if k == "epoch":
                assert o.get(k) == v
            else:
                assert abs(o[k] - v) < 5.1e-5, (k, r, o)


def test_ms_per_stage_checkpoint_surface(whole_run_ms):
    """The reference saves one model per SR stage (len(netG_list) == 2) and
    one recognizer per student entry; our best-save writes the mirrored
    per-stage files (model_best_0/1.msgpack; recognizer_best_0.msgpack for
    the single shared student under --tpg_share)."""
    ref, _, ours, tmp = whole_run_ms
    assert ref["saved"], "reference never saved"
    assert all(s["n_models"] == STU_ITER for s in ref["saved"])
    # reference keeps stu_iter recognizer entries even when shared
    # (super_resolution.py:141-163 builds a list per stage); ours stores the
    # single shared student once — a documented de-duplication
    assert all(s["n_recognizers"] == STU_ITER for s in ref["saved"])

    if any(s["is_best"] for s in ours["saved"]):
        ckpt_dir = os.path.join(tmp, "ckpt_ours", "whole_run_ours")
        for i in range(STU_ITER):
            assert os.path.exists(
                os.path.join(ckpt_dir, f"model_best_{i}.msgpack")), i
        assert os.path.exists(
            os.path.join(ckpt_dir, "recognizer_best_0.msgpack"))
        assert not os.path.exists(
            os.path.join(ckpt_dir, "recognizer_best_1.msgpack"))
