"""WHOLE-RUN parity for the ``--tpg=OPT`` path (VERDICT r3 item 2, second
half): the clova "OPT" TP generator (main.py:60-76 opt dict ->
interfaces/base.py:681-718 ``TPG_init`` -> model/crnn/model.py:25-95
None-ResNet-None-CTC) slotted into the full orchestrator as BOTH the frozen
teacher and the trainable student.

Same harness as tests/test_reference_whole_run.py (the reference's own
``interfaces/super_resolution.py`` TextSR driven in place through the lmdb
shim, identical initial weights, chaos-envelope control), exercising what
the piecewise OPT parity tests (test_recognizer_parity.py full-pipeline
grid) cannot: the orchestrator-level composition —

  * teacher = ``TP_Generator_dict['OPT']`` loading ``opt.saved_model``
    (super_resolution.py:105, base.py:695-716);
  * students = per-stage ``TPG_init`` from the SAME saved_model
    (super_resolution.py:147-163, no recognizer_best next to resume);
  * the OPT prior (T=26 from the FAN-ResNet at 32x100) through
    ``parse_crnn_data`` -> softmax -> [B,37,1,T] -> InfoGen, CTC +
    distill losses, joint Adam over SR + OPT-student params, and eval.

``output_channel`` is 64 (vs the flagship 512) purely for CPU test speed:
the reference ``Model`` takes it from the same opt dict, so both sides run
the identical reduced configuration through identical code paths.
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
from tpgsr_tpu.config import tpg_opt

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

OUTPUT_CHANNEL = 64
ARG_OVER = dict(tpg="OPT")


def _make_opt(saved_model: str):
    """The reference's opt dict (main.py:60-75) with the reduced
    output_channel and the fixture's saved_model path."""
    opt = tpg_opt()
    opt["output_channel"] = OUTPUT_CHANNEL
    opt["saved_model"] = saved_model
    return opt


@pytest.fixture(scope="module")
def whole_run_opt(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("whole_run_opt"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    clova_mod = load_reference_module("model.crnn.model")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")
    tsrn_mod = load_reference_module("model.tsrn")

    # eval recognizer (test_model=CRNN, base.py:634-660) — independent of tpg
    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    # the OPT saved_model: a seeded random clova Model state_dict that
    # TPG_init torch.load()s for teacher AND students on the reference side,
    # and interop.import_opt maps for ours
    opt_saved = os.path.join(tmp, "None-ResNet-None-CTC.pth")
    opt = _make_opt(opt_saved)
    torch.manual_seed(23)
    tm_opt = clova_mod.Model(opt)
    torch.save(tm_opt.state_dict(), opt_saved)

    # control-run copy with ONE student weight perturbed 1e-6: the OPT
    # student's ~50 BatchNorms + near-zero-grad Adam amplify fp noise on the
    # STUDENT branch too, so the chaos envelope must measure that path's
    # intrinsic sensitivity, not only the SR side's
    opt_sd2 = {k: v.clone() for k, v in tm_opt.state_dict().items()}
    with torch.no_grad():
        k0 = "FeatureExtraction.ConvNet.conv0_1.weight"
        opt_sd2[k0] = opt_sd2[k0] + 1e-6
    opt_saved2 = os.path.join(tmp, "None-ResNet-None-CTC_2.pth")
    torch.save(opt_sd2, opt_saved2)
    opt2 = _make_opt(opt_saved2)

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
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=61))
    val_dirs = []
    for si, split in enumerate(SPLITS):
        d = os.path.join(tmp, split)
        _write_lmdb(d, _render_set(N_VAL, seed=70 + si))
        _relabel_with_crnn_preds(d, tm_crnn, metrics_mod, dataset_mod)
        val_dirs.append(d)

    ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                        arg_over=ARG_OVER, opt=opt)
    ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2,
                         arg_over=ARG_OVER, opt=opt2)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=ARG_OVER, opt=opt)
    return ref, ref2, ours


def test_opt_loss_first_iterations_tight(whole_run_opt):
    """Iteration 1 proves the OPT composition pre-update (teacher prior from
    the FAN ResNet, student CTC + distill, InfoGen over the T=26 OPT prior);
    iteration 2 adds one joint Adam + clip + BN-running-stat update across
    the SR model and the BN-heavy OPT student."""
    ref, _, ours = whole_run_opt
    assert len(ref["losses"]) == EPOCHS
    assert len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    # iter 2: measured 2.7e-4 rel — the OPT student stacks ~27 BatchNorms
    # over a batch of 3 and Adam's first step is sign-like wherever |grad|
    # is tiny, so fp32 noise amplifies ~3x faster than the CRNN fixture
    # (<1e-4 there); a systematic optimizer/BN bug still shows at >=1e-3
    np.testing.assert_allclose(ours["losses"][1], ref["losses"][1], rtol=1e-3)
    np.testing.assert_allclose(ours["losses"][2], ref["losses"][2], rtol=6e-3)


def test_opt_loss_trajectory_within_chaos_envelope(whole_run_opt):
    ref, ref2, ours = whole_run_opt
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"rel={rel}\nenv={env}\ntol={tol}"


def test_opt_eval_metric_dict_matches(whole_run_opt):
    """Final eval per split with the OPT student producing the eval-time
    priors (super_resolution.py:735-771) and CRNN decoding the SR output."""
    ref, ref2, ours = whole_run_opt
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (split, k, r[k], c[k], o[k], tol)


def test_opt_eval_accuracy_is_live(whole_run_opt):
    ref, _, _ = whole_run_opt
    accs = [ref["evals"][s]["accuracy"] for s in SPLITS]
    assert any(a and a > 0 for a in accs)
    assert any(a is not None and a < 1.0 for a in accs)


def test_opt_best_checkpoint_decision_matches(whole_run_opt):
    ref, _, ours = whole_run_opt
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
