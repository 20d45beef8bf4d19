"""Shipped-launch-script dead paths: proven against the reference's own code.

The reference ships 9 launch scripts; FIVE of them crash at the first
training batch on the code as checked in — train_TSRN.sh (#1 below),
train_TPGSR-SRResNet.sh (#2), and the whole plain-SR baseline zoo
train_SRCNN.sh / train_SRResNet.sh / train_RDN.sh (#4: their shared
alignCollate_real unpacks four fields from three-field dataset items) —
plus the --test standalone benchmark with its default recognizer (#3).
Each dead path gets a proof pair here (or in its whole-run file): the
reference raises, OUR orchestrator runs the same flag set with the
coherent semantics.  The four launch scripts that DO run are the four
TPGSR TL configs, which is exactly where the whole-run parity fixtures
live (test_reference_whole_run*.py).

1. ``train_TSRN.sh`` (plain TSRN, this file): for ``--arch=tsrn`` the
   dataset dispatch selects ``alignCollate_realWTLAMask``
   (interfaces/base.py:137-141), which returns SIX fields
   (dataset/dataset.py:1240-1323), but the train loop unpacks THREE
   (``images_hr, images_lr, label_strs = data``,
   super_resolution.py:205-206) -> ValueError on the first batch.  (Its
   val side is equally incoherent: ``load_dataset_val =
   lmdbDataset_realForTest``, a directory-of-images reader, pointed at the
   LMDB val dirs.)  Ours runs ``tsrn`` with the plain `real` collate and
   ImageLoss, the semantics the arch had before the WTLAMask experiment
   was left in the dispatch table.

2. ``train_TPGSR-SRResNet.sh``: NameError at the first display tick —
   proven in tests/test_reference_whole_run_srresnet3.py
   (``test_reference_shipped_3stage_script_is_dead``) alongside the
   whole-run parity fixture for its minimal working superset.

3. ``--test`` with ``--rec=crnn`` (the default rec, this file): the
   standalone benchmark path does ``crnn = self.CRNN_init();
   crnn.eval()`` (super_resolution.py:1361-1363) but ``CRNN_init`` returns
   a ``(model, aster_info)`` TUPLE (base.py:634-660) -> AttributeError
   before the first batch.  (Deeper in the same branch:
   ``crnn_input["images"]`` string-indexes the tensor
   ``parse_crnn_data`` returns, and ``model(images_hr)`` at :1381 feeds HR
   to the SR model — the documented latent quirk.)  The maintained
   benchmark path is ``--go_test`` through train() (test.sh).  Ours runs
   --test --rec=crnn end-to-end and returns the
   accuracy/psnr_avg/ssim_avg/fps dict, feeding LR (trainer.test
   docstring records the quirk decision).

Related dead code (not launch scripts) is covered elsewhere: the SEED eval
path (NameError, models/seed.py docstring — functional here), model/net.py
(imports a nonexistent class — exposed as ``--arch textzoom_net``), and
the TypeError-dead W2V collate (test_reference_collate_parity.py).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available
from tests.test_reference_whole_run import (
    HD_U,
    N_TRAIN,
    N_VAL,
    SPLITS,
    _install_profiler_stubs,
    _render_set,
    _write_lmdb,
    install_lmdb_shim,
    run_ours,
    run_reference,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

# train_TSRN.sh: --arch=tsrn --batch_size=48 --STN --mask --use_distill
# --gradient --sr_share --stu_iter=1 (use_distill is ignored by the plain
# branch, super_resolution.py:230-233; use_label off as shipped)
ARG_OVER = dict(arch="tsrn", use_label=False, use_distill=True, stu_iter=1,
                sr_share=True)


def _make_fixture_data(tmp):
    crnn_mod = load_reference_module("model.crnn.crnn")
    tsrn_mod = load_reference_module("model.tsrn")

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    torch.manual_seed(11)
    tm_sr = tsrn_mod.TSRN(
        scale_factor=2, width=128, height=32, STN=True, srb_nums=5,
        mask=True, hidden_units=HD_U,
    )
    sr_sd = {k: v.detach().numpy().copy() for k, v in tm_sr.state_dict().items()}
    sr_resume = os.path.join(tmp, "sr_init", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume))
    torch.save({"state_dict_G": tm_sr.state_dict()}, sr_resume)

    train_dir = os.path.join(tmp, "train")
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=21))
    val_dirs = []
    for si, split in enumerate(SPLITS):
        d = os.path.join(tmp, split)
        _write_lmdb(d, _render_set(N_VAL, seed=40 + si))
        val_dirs.append(d)
    return crnn_path, sr_sd, sr_resume, train_dir, val_dirs


def test_reference_standalone_test_rec_crnn_is_dead(tmp_path):
    """--test --rec=crnn: AttributeError in the reference (docstring #3);
    ours returns the full metric dict."""
    import tests.test_reference_whole_run as wr
    from tpgsr_tpu.config import AttrDict, default_args, load_config, tpg_opt
    from tpgsr_tpu.train.trainer import TextSR

    tmp = str(tmp_path)
    install_lmdb_shim()
    _install_profiler_stubs()
    crnn_mod = load_reference_module("model.crnn.crnn")
    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)
    td = os.path.join(tmp, "testset")
    _write_lmdb(td, _render_set(4, seed=5))

    sup = load_reference_module("interfaces.super_resolution")
    cfg = wr._ref_config(tmp, td, [td], crnn_path)
    args = wr._ref_args(test=True, test_data_dir=td, rec="crnn", resume="")
    work = os.path.join(tmp, "ref_run")
    os.makedirs(work)
    with pytest.raises(AttributeError, match="'tuple' object has no attribute"):
        with wr.cpu_cuda_shim(), wr._chdir(work):
            torch.manual_seed(1234)
            sup.TextSR(cfg, args, None).test()

    config = load_config()
    t = config.TRAIN
    t.batch_size = 4
    t.workers = 0
    t.n_devices = 1
    t.compute_dtype = "fp32"
    t.ckpt_dir = os.path.join(tmp, "ckpt")
    config.TEST.test_data_dir = td
    ours_args = AttrDict(default_args(
        arch="tsrn_tl_cascade", mask=True, STN=True, sr_share=True,
        stu_iter=1, hd_u=HD_U, srb=5, batch_size=4, test=True,
        test_data_dir=td, rec="crnn", vis_dir="dead_test_ours"))
    md = TextSR(config, ours_args, tpg_opt()).test()
    for k in ("accuracy", "psnr_avg", "ssim_avg", "fps"):
        assert k in md and np.isfinite(md[k]), (k, md)


def test_reference_shipped_plain_tsrn_script_is_dead(tmp_path):
    tmp = str(tmp_path)
    install_lmdb_shim()
    _install_profiler_stubs()
    crnn_path, sr_sd, sr_resume, train_dir, val_dirs = _make_fixture_data(tmp)

    with pytest.raises(ValueError, match="too many values to unpack"):
        run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                      arg_over=ARG_OVER, epochs=2)

    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=ARG_OVER, epochs=2)
    assert len(ours["losses"]) == 2
    assert all(np.isfinite(ours["losses"]))
    for split in SPLITS:
        md = ours["evals"][split]
        assert md["psnr_avg"] is not None and np.isfinite(md["psnr_avg"])


def test_reference_plain_zoo_collate_is_dead():
    """EVERY plain (non-TL) arch path is dead in the reference's DataLoader:
    ``alignCollate_real.__call__`` unpacks FOUR fields per item
    (``images_HR, images_lr, label_strs, _ = zip(*batch)``,
    dataset/dataset.py:1141) but ``lmdbDataset_real.__getitem__`` returns
    THREE (dataset.py:133-149) -> ValueError on the first batch of
    train_SRCNN.sh, train_SRResNet.sh, train_RDN.sh and every other
    arch routed through the base.py:210-214 else-branch (srres/rdn/vdsr/
    edsr/lapsrn/esrgan/bicubic), train AND val alike."""
    dataset_mod = load_reference_module("dataset.dataset")

    ds = None  # items come straight from a 3-tuple list; no LMDB needed
    items = [("imgHR", "imgLR", "label"), ("imgHR2", "imgLR2", "label2")]
    coll = dataset_mod.alignCollate_real(imgH=32, imgW=128,
                                         down_sample_scale=2, mask=True)
    with pytest.raises(ValueError, match="not enough values to unpack"):
        coll(items)


def test_reference_shipped_srcnn_script_is_dead_and_ours_scores(tmp_path):
    """train_SRCNN.sh's flag set (the whole plain-SR baseline zoo stands or
    falls with it): the reference crashes in the collate at batch 1; ours
    trains, and — unlike our pre-round-5 eval, which silently skipped the
    recognizer for non-TL archs — scores eval accuracy through the explicit
    test_bible CRNN (super_resolution.py:109-116 applies to every arch)."""
    import jax

    from tests.test_reference_whole_run import _relabel_with_crnn_preds
    from tpgsr_tpu.config import AttrDict, default_args, load_config
    from tpgsr_tpu.train.evaluate import evaluate
    from tpgsr_tpu.train.trainer import TextSR

    tmp = str(tmp_path)
    install_lmdb_shim()
    _install_profiler_stubs()
    crnn_mod = load_reference_module("model.crnn.crnn")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")
    srcnn_mod = load_reference_module("model.srcnn")

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)
    torch.manual_seed(11)
    tm_sr = srcnn_mod.SRCNN(scale_factor=2, width=128, height=32, STN=False)
    sr_resume = os.path.join(tmp, "sr_init", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume))
    torch.save({"state_dict_G": tm_sr.state_dict()}, sr_resume)
    train_dir = os.path.join(tmp, "train")
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=21))
    val_dir = os.path.join(tmp, "val")
    _write_lmdb(val_dir, _render_set(N_VAL, seed=50))
    _relabel_with_crnn_preds(val_dir, tm_crnn, metrics_mod, dataset_mod)

    arg_over = dict(arch="srcnn", STN=False, use_label=False,
                    use_distill=True, stu_iter=1, sr_share=True)
    with pytest.raises(ValueError, match="not enough values to unpack"):
        run_reference(tmp, train_dir, [val_dir], crnn_path, sr_resume,
                      arg_over=arg_over, epochs=2)

    # ours: the same flag set trains + evals, with a LIVE eval recognizer —
    # the relabeled-to-CRNN-HR-predictions labels make accuracy_hr > 0
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [train_dir]
    t.VAL.val_data_dir = [val_dir]
    t.batch_size = N_TRAIN
    t.workers = 0
    t.n_devices = 1
    t.compute_dtype = "fp32"
    t.ckpt_dir = os.path.join(tmp, "ckpt_ours")
    t.VAL.crnn_pretrained = crnn_path
    args = AttrDict(default_args(batch_size=N_TRAIN, mask=True,
                                 vis_dir="srcnn_dead", **arg_over))
    ts = TextSR(config, args)
    state = ts.init_state()
    ts._build_steps(with_train=False)
    md = evaluate(ts._eval_step, state, ts.get_val_data()[0], mesh=ts.mesh,
                  **({"decoder": ts._decoder} if ts._decoder else {}))
    assert md["accuracy_hr"] > 0.0, md  # recognizer is wired, not skipped
    assert np.isfinite(md["psnr_avg"])
