"""WHOLE-RUN parity for the remaining RUNNABLE launch scripts:
train_TPGSR-SRCNN.sh (srcnn_tl) and train_TPGSR-RDN.sh (rdn_tl).

Of the reference's nine launch scripts, five crash at the first batch
(tests/test_reference_dead_paths.py) and the four runnable ones are the
TPGSR TL configs.  TPGSR-TSRN and test.sh are covered by
test_reference_whole_run.py (+ the multistage/3-stage/OPT/ASTER/MORAN
fixtures); this file closes the last two, so EVERY runnable shipped
script's composition is whole-run-proven:

  * ``srcnn_tl``  — `--mask --use_distill --gradient --sr_share
    --stu_iter=1` (train_TPGSR-SRCNN.sh): pre-upsampling backbone
    (interpolate x2 when STN is off, model/srcnn.py:86-95), TP concat
    before EVERY conv, ``nn.MSELoss`` image_crit (base.py:355-357).
  * ``rdn_tl``    — same flags (train_TPGSR-RDN.sh): RDB dense blocks with
    TP concat-fuse + own InfoGen, ``nn.L1Loss`` image_crit
    (base.py:363-365).

Same lmdb-shim harness, identical initial weights, chaos-envelope control,
CRNN-relabeled val labels for live accuracy.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available
from tests.test_reference_whole_run import (
    EPOCHS,
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


def _build_ref_model(arch):
    """Exactly generator_init's constructor call for each arch
    (base.py:355-365)."""
    if arch == "srcnn_tl":
        srcnn_mod = load_reference_module("model.srcnn")
        return srcnn_mod.SRCNN_TL(scale_factor=2, width=128, height=32,
                                  STN=False)
    rdn_mod = load_reference_module("model.rdn")
    return rdn_mod.RDN_TL(scale_factor=2)


@pytest.fixture(scope="module", params=["srcnn_tl", "rdn_tl"])
def whole_run_tl(request, tmp_path_factory):
    arch = request.param
    tmp = str(tmp_path_factory.mktemp(f"whole_run_{arch}"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    torch.manual_seed(11)
    tm_sr = _build_ref_model(arch)
    sr_sd = {k: v.detach().numpy().copy() for k, v in tm_sr.state_dict().items()}
    sr_resume = os.path.join(tmp, "sr_init", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume))
    torch.save({"state_dict_G": tm_sr.state_dict()}, sr_resume)

    sd2 = {k: v.clone() for k, v in tm_sr.state_dict().items()}
    first = next(k for k, v in sd2.items()
                 if k.endswith("weight") and v.dtype.is_floating_point)
    with torch.no_grad():
        sd2[first] = sd2[first] + 1e-6
    sr_resume2 = os.path.join(tmp, "sr_init2", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume2))
    torch.save({"state_dict_G": sd2}, sr_resume2)

    train_dir = os.path.join(tmp, "train")
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=21))
    val_dirs = []
    for si, split in enumerate(SPLITS):
        d = os.path.join(tmp, split)
        _write_lmdb(d, _render_set(N_VAL, seed=120 + si))
        _relabel_with_crnn_preds(d, tm_crnn, metrics_mod, dataset_mod)
        val_dirs.append(d)

    # the scripts: --mask --use_distill --gradient --sr_share --stu_iter=1
    # (no --STN, no --use_label)
    arg_over = dict(arch=arch, STN=False, stu_iter=1, sr_share=True,
                    tpg_share=False, use_label=False, use_distill=True)
    ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                        arg_over=arg_over)
    ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2,
                         arg_over=arg_over)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=arg_over)
    return arch, ref, ref2, ours


def test_tl_zoo_loss_trajectory(whole_run_tl):
    """Per-arch loss composition (MSE*100 / L1*100 + distill*100): iter-1
    parity at 5e-6, full trajectory within the chaos envelope."""
    arch, ref, ref2, ours = whole_run_tl
    assert len(ref["losses"]) == EPOCHS and len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"{arch}: rel={rel}\nenv={env}\ntol={tol}"


def test_tl_zoo_eval_metric_dict_matches(whole_run_tl):
    arch, ref, ref2, ours = whole_run_tl
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (arch, split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (arch, split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (arch, split, k, r[k], c[k], o[k])


def test_tl_zoo_best_checkpoint_decision_matches(whole_run_tl):
    arch, ref, _, ours = whole_run_tl
    ref_best = [s["iters"] for s in ref["saved"] if s["is_best"]]
    our_best = [s["iters"] for s in ours["saved"] if s["is_best"]]
    assert ref_best == our_best, arch
