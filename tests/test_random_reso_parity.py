"""--random_reso: confidence parity vs the reference + orchestrator wiring.

The reference exercises --random_reso through EVAL only (its train loop
cannot consume the variable-resolution list batches: ``images_lr.to(...)``
on a list, super_resolution.py:224-227).  Coverage here:

* ``cal_conf`` parity: our train/random_reso.cal_conf vs the reference's
  own ``TextSR.cal_conf`` (super_resolution.py:51-73) driven unbound with
  the same random CRNN — same per-image confidences.  The reference also
  computes a cv2 Laplacian sharpness var it never uses for the gate; the
  stubs below make that executable.
* the gate itself (conf > threshold AND H > min_height, :703-707) is
  asserted at unit level in test_utils_data.test_eval_random_reso_gating;
  thresholds (0.85 cascade / 0.9 tsrn, :703 vs :630) are wired in
  trainer._run_val_random_reso.
* orchestrator wiring: --syn --random_reso --go_test runs end-to-end
  through TextSR (variable-resolution val batches, bucketed per-shape SR
  jits, metric_dict schema), and --syn --random_reso TRAINING raises the
  documented eval-only error instead of the reference's crash.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)


def _install_cv2_laplacian_stubs():
    """Real cvtColor/Laplacian equivalents so the reference's cal_conf
    executes (its l_var output is computed-but-unused, like ours)."""
    cv2m = sys.modules.get("cv2") or types.ModuleType("cv2")
    sys.modules["cv2"] = cv2m
    if not hasattr(cv2m, "CV_64F"):
        cv2m.CV_64F = 6
        cv2m.COLOR_RGB2GRAY = 7

        def _cvt(img, code):
            f = img.astype(np.float64)
            g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
            return np.round(g).astype(img.dtype)

        def _laplacian(img, ddepth):
            p = np.pad(img.astype(np.float64), 1, mode="reflect")
            return (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
                    - 4.0 * img.astype(np.float64))

        cv2m.cvtColor = _cvt
        cv2m.Laplacian = _laplacian


def test_cal_conf_matches_reference():
    from tests.test_reference_whole_run import _install_profiler_stubs, install_lmdb_shim

    install_lmdb_shim()
    _install_profiler_stubs()
    _install_cv2_laplacian_stubs()
    sup = load_reference_module("interfaces.super_resolution")
    base = load_reference_module("interfaces.base")
    crnn_mod = load_reference_module("model.crnn.crnn")

    torch.manual_seed(3)
    tm = crnn_mod.CRNN(32, 1, 37, 256).eval()

    # unbound cal_conf with a minimal self: parse_crnn_data reads
    # config.TRAIN.width and args.random_reso (base.py:806-829)
    fake = types.SimpleNamespace(
        config=types.SimpleNamespace(TRAIN=types.SimpleNamespace(width=128)),
        args=types.SimpleNamespace(random_reso=False),
    )
    fake.parse_crnn_data = types.MethodType(base.TextBase.parse_crnn_data, fake)

    rng = np.random.default_rng(0)
    shapes = [(16, 40), (20, 64), (13, 29)]
    imgs = [rng.random((h, w, 3), np.float32).astype(np.float32) for h, w in shapes]
    t_imgs = [torch.from_numpy(np.transpose(i, (2, 0, 1)))[None] for i in imgs]
    with torch.no_grad():
        ref_confs = sup.TextSR.cal_conf(fake, t_imgs, tm)

    import jax

    from tpgsr_tpu.interop.torch_import import import_crnn
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.train.priors import parse_crnn_data
    from tpgsr_tpu.train.random_reso import cal_conf

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(np.asarray, import_crnn(sd))
    model = CRNN(nclass=37)
    crnn_apply = lambda x: model.apply(variables, parse_crnn_data(x), train=False)
    ours = cal_conf(imgs, crnn_apply)
    np.testing.assert_allclose(ours, [float(c) for c in ref_confs], rtol=2e-4)


def test_random_reso_go_test_end_to_end(tmp_path, monkeypatch):
    from tests.fixtures import make_textzoom_lmdb
    from tpgsr_tpu.config import AttrDict, default_args, load_config
    from tpgsr_tpu.train.trainer import TextSR

    monkeypatch.chdir(tmp_path)
    d = make_textzoom_lmdb(str(tmp_path / "train"), n=10, seed=0)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [d]
    t.VAL.val_data_dir = [d]
    t.batch_size = 4
    t.epochs = 1
    t.workers = 0
    t.ckpt_dir = str(tmp_path / "ckpt")
    base_kw = dict(
        arch="tsrn_tl_cascade", STN=False, mask=False, use_distill=True,
        gradient=True, sr_share=True, tpg_share=True, stu_iter=1,
        srb=2, hd_u=8, batch_size=4, syn=True, random_reso=True,
    )
    args = AttrDict(default_args(go_test=True, vis_dir="rr", **base_kw))
    ts = TextSR(config, args)
    ts.train()  # go_test: eval-only
    loader = ts.get_val_data()[0]
    md = ts._run_val_random_reso(ts._state or ts.init_state(), loader)
    assert md["images"] == 10
    assert md["go_LR"] + md["go_SR"] == 10
    assert np.isfinite(md["psnr_avg"]) and np.isfinite(md["ssim_avg"])
    assert 0.0 <= md["accuracy"] <= 1.0

    # training with variable-resolution syn batches is eval-only (module
    # docstring); the guard must fire before any step compiles
    args2 = AttrDict(default_args(vis_dir="rr2", **base_kw))
    with pytest.raises(ValueError, match="eval-only"):
        TextSR(config, args2).train()


def test_random_reso_go_test_fixed_reso_batches(tmp_path, monkeypatch):
    """--random_reso WITHOUT --syn (the audit's go_test case): batches come
    from the fixed-shape realWTL collate as arrays — the evaluator splits
    them per image, and the collate must ship full float 4-channel arrays
    (not the device-side uint8/mask-append wire the jitted step uses)."""
    from tests.fixtures import make_textzoom_lmdb
    from tpgsr_tpu.config import AttrDict, default_args, load_config
    from tpgsr_tpu.train.trainer import TextSR

    monkeypatch.chdir(tmp_path)
    d = make_textzoom_lmdb(str(tmp_path / "train"), n=8, seed=1)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [d]
    t.VAL.val_data_dir = [d]
    t.batch_size = 4
    t.workers = 0
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = AttrDict(default_args(
        arch="tsrn_tl_cascade", STN=True, mask=True, use_distill=True,
        gradient=True, sr_share=True, tpg_share=False, stu_iter=1,
        srb=2, hd_u=8, batch_size=4, random_reso=True, go_test=True,
        vis_dir="rr_fixed"))
    ts = TextSR(config, args)
    ts.train()  # go_test -> _run_val -> _run_val_random_reso on array batches
    md = ts._run_val_random_reso(ts._state or ts.init_state(),
                                 ts.get_val_data()[0])
    assert md["images"] == 8
    assert md["go_LR"] + md["go_SR"] == 8
    assert np.isfinite(md["psnr_avg"]) and np.isfinite(md["ssim_avg"])
