"""WHOLE-RUN parity with the MORAN eval recognizer (completing the eval
test_bible family: CRNN -> test_reference_whole_run, ASTER -> _aster,
MORAN -> here).

Same harness as tests/test_reference_whole_run.py (the reference's own
``interfaces/super_resolution.py`` TextSR driven in place through the lmdb
shim, identical initial weights, chaos-envelope control), but with
``--test_model=MORAN``: the eval ``test_bible`` entry is the MORAN
recognizer (super_resolution.py:127-135 — ``MORAN_init`` from
``TRAIN.VAL.moran_pretrained`` (base.py:587-606), ``parse_moran_data``
input glue (base.py:608-632: bicubic 32x100 RGB -> ITU gray, '0'*20
targets), and the inline attention decode + ``converter_moran.decode`` +
``split('$')[0]`` postprocess (super_resolution.py:927-935, 1035-1056)).

The reference's MORAN is CUDA-era torch-1.2 code; three environment shims
(numerics unchanged) make it drivable on this CUDA-less torch-2.x host:

* ``cpu_cuda_shim`` (shared with the ASTER fixture): ``Tensor.cuda``/
  ``Module.cuda`` -> identity (MORN's grid and ASRN's targets call
  ``.cuda()`` unconditionally, morn.py:39-40, asrn_res.py:132-134).
* ``moran_type_shim`` (here): MORN materialises its base grid with
  ``torch.from_numpy(grid).type('torch.cuda.FloatTensor')`` (morn.py:38)
  and asserts ``x.data.type() == 'torch.cuda.FloatTensor'`` on every
  forward (morn.py:54).  ``Tensor.type(str)`` maps 'torch.cuda.X' ->
  'torch.X' and the no-arg form reports the cuda-prefixed name.  The only
  other no-arg caller on the driven path is ssim_psnr.py:66, an equality
  between two shimmed values — branch-identical.
* debug-branch stubs (here): the eval loop invokes MORAN with
  ``debug=True`` (super_resolution.py:908-915, 803-819), whose MORN branch
  builds an offset visualisation via matplotlib/colour/torchvision/cv2
  (morn.py:82-137) and returns it as ``demo`` — DISCARDED by every caller
  (``aster_output_*[0]`` only).  colour/ToPILImage/cv2.merge+addWeighted+
  resize are stubbed just enough to execute; none of it touches the
  recognizer numerics.

Both sides load the SAME random-weight MORAN checkpoint; half the val
labels are rewritten to that MORAN's own HR predictions through the real
reference eval path so accuracy is a live signal, not a vacuous 0 == 0.
"""

from __future__ import annotations

import contextlib
import os
import string
import sys

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
ARG_OVER = dict(test_model="MORAN")
MORAN_ALPHABET = ":".join(string.digits + string.ascii_lowercase + "$")


@contextlib.contextmanager
def moran_type_shim():
    """Map MORN's hardcoded 'torch.cuda.FloatTensor' dtype strings onto this
    CPU-only host (module docstring, bullet 2), and restore ``.cpu()``'s
    COPY semantics: on the reference's CUDA host ``x.data.cpu()`` is a
    device->host copy, but on a CPU host it aliases, so MORN's debug-branch
    in-place viz (``x_rectified[i].data.cpu().mul_(0.5).add_(0.5)``,
    morn.py:104,123) would corrupt the rectified tensor BEFORE the ASRN
    consumes it — a pure environment artifact the true run never sees."""
    old_type = torch.Tensor.type
    old_cpu = torch.Tensor.cpu
    old_dp_fw = torch.nn.DataParallel.forward

    def _type(self, dtype=None, *a, **k):
        if dtype is None:
            s = old_type(self)
            return s if s.startswith("torch.cuda.") else s.replace(
                "torch.", "torch.cuda.", 1)
        if isinstance(dtype, str) and dtype.startswith("torch.cuda."):
            dtype = dtype.replace("torch.cuda.", "torch.", 1)
        return old_type(self, dtype, *a, **k)

    def _dp_forward(self, *inputs, **kw):
        # the MORAN test_bible entry re-sets ``moran.device_ids = [0]``
        # (super_resolution.py:128-130), defeating CPU DataParallel's
        # empty-device_ids bypass; single-device DataParallel forward is
        # numerically the plain module forward either way
        if not torch.cuda.is_available():
            return self.module(*inputs, **kw)
        return old_dp_fw(self, *inputs, **kw)

    torch.Tensor.cpu = lambda self, *a, **k: old_cpu(self, *a, **k).clone()
    torch.Tensor.type = _type
    torch.nn.DataParallel.forward = _dp_forward
    try:
        yield
    finally:
        torch.Tensor.type = old_type
        torch.Tensor.cpu = old_cpu
        torch.nn.DataParallel.forward = old_dp_fw


def _install_debug_branch_stubs():
    """Make MORN's discarded-output debug visualisation executable
    (morn.py:82-137; module docstring, bullet 3)."""
    import types

    class _Color:
        def __init__(self, *a, **k):
            pass

        def range_to(self, other, steps):
            return [_Color() for _ in range(steps)]

        @property
        def rgb(self):
            return (0.0, 0.0, 0.0)

    colour = sys.modules.get("colour") or types.ModuleType("colour")
    colour.Color = _Color
    sys.modules["colour"] = colour

    def _to_pil(t):
        arr = np.clip(t.detach().cpu().numpy(), 0.0, 1.0)
        arr = (arr * 255 + 0.5).astype(np.uint8)
        if arr.ndim == 3:
            arr = arr.transpose(1, 2, 0)
            if arr.shape[2] == 1:
                arr = arr[:, :, 0]
        return arr

    tvt = sys.modules["torchvision.transforms"]
    if not hasattr(tvt, "ToPILImage"):
        tvt.ToPILImage = lambda: _to_pil

    cv2m = sys.modules["cv2"]
    if not hasattr(cv2m, "merge"):
        cv2m.merge = lambda chans: np.stack(chans, axis=-1)

        def _add_weighted(a, alpha, b, beta, gamma, dst=None):
            out = (np.asarray(a, np.float64) * alpha
                   + np.asarray(b, np.float64) * beta + gamma)
            out = out.astype(np.asarray(b).dtype)
            if dst is not None:
                np.copyto(dst, out)
            return out

        cv2m.addWeighted = _add_weighted
        cv2m.resize = lambda img, size: img


def _parse_moran_torch(imgs_nchw, um):
    """base.py:608-632 restated: bicubic 32x100 on RGB, ITU-R 601 gray,
    '0'*20 targets through the reference's own converter."""
    import torch.nn.functional as F

    x = F.interpolate(imgs_nchw[:, :3], (32, 100), mode="bicubic")
    gray = 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]
    conv = um.strLabelConverterForAttention(MORAN_ALPHABET, ":")
    t, l = conv.encode(["0" * 20] * imgs_nchw.shape[0])
    return gray, l, t, conv


def _relabel_with_moran_preds(lmdb_dir, tm_moran, um, dataset_mod):
    """Rewrite HALF the LMDB's labels to the (random) eval MORAN's HR
    predictions through the real eval input path, so accuracy is live."""
    from tpgsr_tpu.data.lmdb import LMDBReader

    ds = dataset_mod.lmdbDataset_real(root=lmdb_dir, voc_type="all",
                                      max_len=100, test=True)
    coll = dataset_mod.alignCollate_realWTL(
        imgH=32, imgW=128, down_sample_scale=2, mask=True, train=False
    )
    items = [ds[i] for i in range(len(ds))]
    images_hr = coll(items)[0]
    with torch.no_grad(), cpu_cuda_shim(), moran_type_shim():
        gray, length, text, conv = _parse_moran_torch(images_hr, um)
        out = tm_moran(gray, length, text, text, test=True)
        probs, _probs_rev = out
        _, ids = probs.max(1)
        sim_preds = conv.decode(ids.data, length.data)
        preds = [p.split("$")[0] for p in sim_preds]

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
def whole_run_moran(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("whole_run_moran"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    dataset_mod = load_reference_module("dataset.dataset")
    tsrn_mod = load_reference_module("model.tsrn")
    um = load_reference_module("utils.utils_moran")
    moran_mod = load_reference_module("model.moran.moran")
    _install_debug_branch_stubs()

    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    # random-weight reference MORAN, built exactly as MORAN_init does
    # (base.py:589-591) and saved the way it loads it (raw state_dict,
    # torch.load + 'module.'-strip, base.py:593-599)
    torch.manual_seed(29)
    with cpu_cuda_shim(), moran_type_shim():
        tm_moran = moran_mod.MORAN(
            1, len(MORAN_ALPHABET.split(":")), 256, 32, 100,
            BidirDecoder=True, inputDataType="torch.cuda.FloatTensor",
            CUDA=True,
        ).eval()
    moran_path = os.path.join(tmp, "moran.pth")
    torch.save(tm_moran.state_dict(), moran_path)

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
        _write_lmdb(d, _render_set(N_VAL, seed=80 + si))
        _relabel_with_moran_preds(d, tm_moran, um, dataset_mod)
        val_dirs.append(d)

    val_over = dict(moran_pretrained=moran_path)
    with moran_type_shim():
        ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                            arg_over=ARG_OVER, val_over=val_over)
        ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2,
                             arg_over=ARG_OVER, val_over=val_over)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd,
                    arg_over=ARG_OVER, val_over=val_over)
    return ref, ref2, ours


def test_moran_loss_trajectory_unaffected_and_tight(whole_run_moran):
    """The eval recognizer must not perturb training: iter-1 parity at the
    same 5e-6 as the CRNN fixture, full trajectory within the envelope."""
    ref, ref2, ours = whole_run_moran
    assert len(ref["losses"]) == EPOCHS and len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"rel={rel}\nenv={env}\ntol={tol}"


def test_moran_eval_metric_dict_matches(whole_run_moran):
    """Final eval per split with the MORAN test_bible entry: accuracy from
    the attention decode on SR/LR/HR (super_resolution.py:906-935,
    1035-1056), PSNR/SSIM unchanged."""
    ref, ref2, ours = whole_run_moran
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (split, k, r[k], c[k], o[k], tol)


def test_moran_eval_accuracy_is_live(whole_run_moran):
    ref, _, _ = whole_run_moran
    accs = [ref["evals"][s]["accuracy"] for s in SPLITS]
    assert any(a and a > 0 for a in accs), accs
    assert any(a is not None and a < 1.0 for a in accs), accs


def test_moran_best_checkpoint_decision_matches(whole_run_moran):
    ref, _, ours = whole_run_moran
    ref_best = [s["iters"] for s in ref["saved"] if s["is_best"]]
    our_best = [s["iters"] for s in ours["saved"] if s["is_best"]]
    assert ref_best == our_best
