"""WHOLE-RUN parity: drive the reference's OWN TextSR orchestrator end-to-end
and compare against ours (VERDICT r2 item 1 — the last rung of the proof
ladder).

The reference's ``interfaces/super_resolution.py`` TextSR is imported in
place (tests/reference_loader.py stubs) and its ``train()`` is run for 10
real iterations + one eval over two val splits on a synthetic LMDB, with:

  * ``sys.modules['lmdb']`` shimmed over our from-scratch
    ``tpgsr_tpu.data.lmdb.LMDBReader`` — the reference's own dataset
    (dataset/dataset.py:104-149 ``lmdb.open``/``begin``/``get``) reads
    through our B+tree parser, validating it under the reference's own
    access pattern;
  * identical initial weights on both sides: the SR model through the
    reference's resume path (a ``{'state_dict_G': ...}`` checkpoint,
    interfaces/base.py:402-424) and teacher/students/eval-CRNN through
    ``TRAIN.VAL.crnn_pretrained`` (interfaces/base.py:634-660) — the same
    files our ``interop.torch_import`` imports;
  * batch_size = dataset size = 3, so each epoch is exactly one batch
    holding the whole dataset and every loss/grad/BN reduction is a mean
    over the batch — within-batch order (torch vs numpy shuffles) cannot
    affect the trajectory, and B//4 = 0 disables the prior dropout on both
    sides (dropout itself is covered by the step-loss parity tests).

Asserted: the FULL 10-iteration loss trajectory (every ``loss_im`` the
reference backpropagates, captured via a ``Tensor.backward`` spy, vs every
``loss_total`` our jitted train step returns) — which transitively proves
Adam + per-model clip + BN running-stat updates and the data/loss glue
compose identically — and the final eval ``metric_dict`` (accuracy /
psnr_avg / ssim_avg per split, interfaces/super_resolution.py:1299-1347)
including best-checkpoint triggering.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.reference_loader import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)

N_TRAIN = 3  # == batch_size: one batch per epoch, B//4 == 0 (see module doc)
N_VAL = 5  # -> batches of 3 and 2: exercises the partial-batch eval path
EPOCHS = 10  # 1 iter/epoch -> 10 train iterations
HD_U = 16  # smaller hidden_units than the flagship 32: same code path, faster
SPLITS = ("valA", "valB")


# --------------------------------------------------------------- lmdb shim


def install_lmdb_shim():
    """Back the reference's ``import lmdb`` with our LMDBReader.

    Mutates (or creates) the existing ``sys.modules['lmdb']`` object so
    modules that already bound it (dataset/dataset.py's module-level
    ``import lmdb``) see the functional shim too.
    """
    from tpgsr_tpu.data.lmdb import LMDBReader

    class _Txn:
        def __init__(self, reader):
            self._r = reader

        def get(self, key):
            return self._r.get(bytes(key))

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _Env:
        def __init__(self, path):
            self._r = LMDBReader(path)

        def begin(self, write=False):
            return _Txn(self._r)

    def _open(path, **kwargs):  # lmdb.open(root, max_readers=..., ...)
        return _Env(path)

    mod = sys.modules.get("lmdb")
    if mod is None:
        mod = types.ModuleType("lmdb")
        sys.modules["lmdb"] = mod
    mod.open = _open  # force-set: replaces reference_loader's dead stub
    return mod


def _install_profiler_stubs():
    """ptflops/thop are absent here; the reference only uses them for
    MAC/param pretty-printing at init (interfaces/base.py:372-381)."""
    for name in ("ptflops", "thop"):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["ptflops"].get_model_complexity_info = (
        lambda *a, **k: ("0 MMac", "0 M")
    )
    sys.modules["thop"].profile = lambda *a, **k: (0, 0)


# ------------------------------------------------------------ fixture data


def _write_lmdb(path, labels_imgs):
    from tpgsr_tpu.data.lmdb import write_lmdb

    items = [(b"num-samples", str(len(labels_imgs)).encode())]
    for i, (label, hr, lr) in enumerate(labels_imgs, start=1):
        items.append((b"label-%09d" % i, label.encode()))
        items.append((b"image_hr-%09d" % i, hr))
        items.append((b"image_lr-%09d" % i, lr))
    write_lmdb(path, items)


def _render_set(n, seed):
    import io

    from tests.fixtures import WORDS, render_word

    out = []
    for i in range(n):
        word = WORDS[(seed + i) % len(WORDS)]
        hr = render_word(word, (128, 32), seed=seed * 100 + i)
        lr = hr.resize((64, 16), 3)  # PIL BICUBIC
        bh, bl = io.BytesIO(), io.BytesIO()
        hr.save(bh, "JPEG", quality=92)
        lr.save(bl, "JPEG", quality=92)
        out.append((word, bh.getvalue(), bl.getvalue()))
    return out


def _parse_crnn_torch(imgs_nchw):
    """interfaces/base.py:806-829 (re-stated 4-line adapter)."""
    x = F.interpolate(imgs_nchw[:, :3], (32, 100), mode="bicubic")
    return 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]


def _relabel_with_crnn_preds(lmdb_dir, tm_crnn, metrics_mod, dataset_mod):
    """Rewrite HALF the LMDB's labels to whatever the (random) eval CRNN
    predicts on each HR image THROUGH the real eval input path (dataset
    decode -> alignCollate_realWTL resize -> parse_crnn_data), so accuracy
    is a live signal strictly between 0 and 1 instead of a vacuous 0 == 0
    (the odd samples keep their unmatchable render words)."""
    from tpgsr_tpu.data.lmdb import LMDBReader

    ds = dataset_mod.lmdbDataset_real(root=lmdb_dir, voc_type="all", max_len=100, test=True)
    coll = dataset_mod.alignCollate_realWTL(
        imgH=32, imgW=128, down_sample_scale=2, mask=True, train=False
    )
    items = [ds[i] for i in range(len(ds))]
    images_hr = coll(items)[0]
    with torch.no_grad():
        preds = metrics_mod.get_string_crnn(tm_crnn(_parse_crnn_torch(images_hr)))

    r = LMDBReader(lmdb_dir)
    rows = []
    for i in range(len(items)):
        use_pred = i % 2 == 0 and 2 <= len(preds[i]) <= 20
        label = preds[i] if use_pred else items[i][2]
        hr = r.get(b"image_hr-%09d" % (i + 1))
        lr = r.get(b"image_lr-%09d" % (i + 1))
        rows.append((label, hr, lr))
    r.close()
    _write_lmdb(lmdb_dir, rows)


@contextlib.contextmanager
def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


class _Recorder:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, global_step=None):
        self.scalars.append((tag, float(value), int(global_step)))

    def get(self, tag):
        return {s: v for t, v, s in self.scalars if t == tag}


def _ref_args(**overrides):
    d = dict(
        arch="tsrn_tl_cascade", go_test=False, test=False, test_data_dir=None,
        batch_size=N_TRAIN, resume="", vis_dir="whole_run_ref", rec="crnn",
        STN=True, syn=False, mixed=False, ic15sr=False, mask=True,
        gradient=True, hd_u=HD_U, srb=5, stu_iter=1, demo=False,
        demo_dir="./demo", test_model="CRNN", sr_share=True, tpg_share=False,
        use_label=True, use_distill=True, ssim_loss=False, random_reso=False,
        tpg="CRNN", config="super_resolution.yaml",
    )
    d.update(overrides)
    return SimpleNamespace(**d)


def _ref_config(tmp, train_dir, val_dirs, crnn_path):
    import yaml

    from tpgsr_tpu.config import AttrDict

    with open("/root/reference/config/super_resolution.yaml") as f:
        cfg = AttrDict.deep(yaml.safe_load(f))
    t = cfg.TRAIN
    t.train_data_dir = [train_dir]
    t.batch_size = N_TRAIN
    t.epochs = EPOCHS
    t.ngpu = 1
    t.workers = 0
    t.ckpt_dir = os.path.join(tmp, "ckpt_ref")
    t.saveInterval = 100000
    t.displayInterval = 5
    t.VAL.val_data_dir = list(val_dirs)
    t.VAL.valInterval = EPOCHS  # fires exactly once, at the last iteration
    t.VAL.crnn_pretrained = crnn_path
    return cfg


@contextlib.contextmanager
def cpu_cuda_shim():
    """Run the reference's CUDA-era torch-1.2 code on this CUDA-less,
    torch-2.x host.  Two environment shims, numerics unchanged:

    * ASTER's attention head calls ``.cuda()`` on tensors unconditionally
      (model/recognizer/attention_recognition_head.py:30-91,210-261 — hit
      by EVERY eval-mode forward via beam_search,
      recognizer_builder.py:93): ``Tensor.cuda``/``Module.cuda`` become
      identity and ``torch.cuda.device`` a nullcontext.
    * beam_search computes predecessor indices as ``candidates /
      num_classes + pos`` (attention_recognition_head.py:111) — integer
      division on torch 1.2 (the reference's badge), TRUE division (float)
      on this torch, so ``index_select`` raises.  Coercing a float index to
      long restores the 1.2 values exactly: trunc(k + frac + pos) with
      0 <= frac < 1 and exact small-int floats is k + pos, the 1.2
      floor-division result.  Only would-be-TypeError calls are touched —
      long-index calls pass through untouched.
    """
    old_t = torch.Tensor.cuda
    old_m = torch.nn.Module.cuda
    old_d = torch.cuda.device
    old_is = torch.Tensor.index_select

    def _index_select(self, dim, index):
        if isinstance(index, torch.Tensor) and index.is_floating_point():
            index = index.long()
        return old_is(self, dim, index)

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.device = lambda *a, **k: contextlib.nullcontext()
    torch.Tensor.index_select = _index_select
    try:
        yield
    finally:
        torch.Tensor.cuda = old_t
        torch.nn.Module.cuda = old_m
        torch.cuda.device = old_d
        torch.Tensor.index_select = old_is


def run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume,
                  arg_over=None, epochs=EPOCHS, val_over=None, opt=None):
    """Drive the reference orchestrator.  ``arg_over`` extends/overrides the
    CLI-args namespace (e.g. stu_iter=2, tpg_share=True for the multi-stage
    cascade fixture in test_reference_whole_run_multistage.py); ``val_over``
    extends cfg.TRAIN.VAL (e.g. rec_pretrained for --test_model=ASTER);
    ``opt`` is the TPG option dict handed to TextSR for --tpg=OPT
    (main.py:60-76, test_reference_whole_run_opt.py)."""
    _install_profiler_stubs()
    install_lmdb_shim()
    sup = load_reference_module("interfaces.super_resolution")
    base = load_reference_module("interfaces.base")

    cfg = _ref_config(tmp, train_dir, val_dirs, crnn_path)
    cfg.TRAIN.epochs = epochs
    cfg.TRAIN.VAL.valInterval = epochs  # fires exactly once, at the end
    for k, v in (val_over or {}).items():
        cfg.TRAIN.VAL[k] = v
    args = _ref_args(resume=sr_resume, **(arg_over or {}))

    recorder = _Recorder()
    losses = []
    saved = []

    old_writer = sup.SummaryWriter
    old_save = base.TextBase.save_checkpoint
    old_backward = torch.Tensor.backward

    def spy_backward(self, *a, **k):
        if self.ndim == 0:  # the train loop's single scalar loss_im
            losses.append(float(self.detach()))
        return old_backward(self, *a, **k)

    def spy_save(self, netG_list, epoch, iters, best_acc_dict, best_model_info,
                 is_best, converge_list, recognizer=None):
        saved.append({
            "iters": iters, "is_best": is_best,
            "best_acc": dict(best_acc_dict),
            # per-stage surface (base.py:553-585): model_best_<i> per SR
            # stage, recognizer_best_<i> per student entry
            "n_models": len(netG_list),
            "n_recognizers": (len(recognizer) if isinstance(recognizer, list)
                              else (0 if recognizer is None else 1)),
        })

    try:
        sup.SummaryWriter = lambda d: recorder
        base.TextBase.save_checkpoint = spy_save
        torch.Tensor.backward = spy_backward
        work = os.path.join(tmp, "ref_run")
        os.makedirs(work, exist_ok=True)
        with cpu_cuda_shim(), _chdir(work):
            torch.manual_seed(1234)
            t = sup.TextSR(cfg, args, opt)
            t.train()
    finally:
        sup.SummaryWriter = old_writer
        base.TextBase.save_checkpoint = old_save
        torch.Tensor.backward = old_backward

    evals = {}
    for split in [os.path.basename(d) for d in val_dirs]:
        evals[split] = {
            k: recorder.get(f"eval/{k}_{split}").get(epochs)
            for k in ("accuracy", "psnr_avg", "ssim_avg")
        }
    return {"losses": losses, "scalars": recorder, "evals": evals, "saved": saved}


def run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd, arg_over=None,
             epochs=EPOCHS, real_save=False, val_over=None, opt=None):
    """Drive our TextSR with the same data/weights.  ``arg_over``/``val_over``
    mirror run_reference's; ``real_save`` additionally writes the checkpoint
    files (for per-stage save-surface assertions) while still recording the
    spy."""
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.interop import torch_import as ti
    from tpgsr_tpu.parallel import shard_params
    from tpgsr_tpu.train import checkpoint as ckpt_mod
    from tpgsr_tpu.train.state import make_optimizer
    from tpgsr_tpu.train.trainer import TextSR

    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [train_dir]
    t.batch_size = N_TRAIN
    t.epochs = epochs
    t.workers = 0
    t.n_devices = 1
    t.compute_dtype = "fp32"
    t.dispatch_chain = 1  # per-step dispatch: the spy hooks every iteration
    t.ckpt_dir = os.path.join(tmp, "ckpt_ours")
    t.saveInterval = 100000
    t.displayInterval = 5
    t.VAL.val_data_dir = list(val_dirs)
    t.VAL.valInterval = epochs
    t.VAL.crnn_pretrained = crnn_path
    for k, v in (val_over or {}).items():
        t.VAL[k] = v

    kw = dict(
        arch="tsrn_tl_cascade", mask=True, gradient=True, STN=True,
        sr_share=True, use_distill=True, use_label=True, stu_iter=1,
        hd_u=HD_U, srb=5, batch_size=N_TRAIN, vis_dir="whole_run_ours",
    )
    kw.update(arg_over or {})
    args = default_args(**kw)

    work = os.path.join(tmp, "ours_run")
    os.makedirs(work, exist_ok=True)
    saved = []
    old_save = ckpt_mod.save_checkpoint
    losses = []

    def spy_save(ckpt_dir, state, info, is_best, converge_list=None):
        saved.append({"iters": info["iters"], "is_best": is_best,
                      "best_acc": dict(info["best_history_res"])})
        if real_save:
            old_save(ckpt_dir, state, info, is_best, converge_list)

    try:
        ckpt_mod.save_checkpoint = spy_save
        # trainer binds `ckpt` to the module, so patch through it too
        import tpgsr_tpu.train.trainer as trainer_mod

        trainer_mod.ckpt.save_checkpoint = spy_save
        with _chdir(work):
            ts = TextSR(config, args, opt)
            state = ts.init_state()
            v = ti.import_sr_checkpoint(kw["arch"], sr_sd, srb_nums=5)
            # the reference loads the SAME resume file into every cascade
            # stage (generator_init(i), super_resolution.py:87-94); copy the
            # tree per stage so donated buffers never alias
            import jax

            n_sr = len(state.sr_params)
            state = state.replace(
                sr_params=tuple(
                    jax.tree_util.tree_map(np.array, v["params"])
                    for _ in range(n_sr)
                ),
                sr_stats=tuple(
                    jax.tree_util.tree_map(np.array, v["batch_stats"])
                    for _ in range(n_sr)
                ),
            )
            # fresh Adam state over the imported params (zeros, like the
            # reference's fresh torch Adam)
            tx = make_optimizer(float(t.lr), float(t.beta1))
            state = state.replace(opt_state=tx.init(state.trainable))
            ts._state = shard_params(ts.mesh, state)

            ts._build_steps()
            inner = ts._train_step

            def spy_step(s, arrays):
                s, metrics = inner(s, arrays)
                losses.append(float(np.asarray(metrics["loss_total"])))
                return s, metrics

            ts._train_step = spy_step
            ts.train()
        jsonl = os.path.join(work, "tensorboard", "whole_run_ours", "scalars.jsonl")
        scalars = {}
        with open(jsonl) as f:
            for line in f:
                rec = json.loads(line)
                scalars[(rec["tag"], rec["step"])] = rec["value"]
    finally:
        ckpt_mod.save_checkpoint = old_save
        trainer_mod.ckpt.save_checkpoint = old_save

    evals = {}
    for split in [os.path.basename(d) for d in val_dirs]:
        evals[split] = {
            k: scalars.get((f"eval/{k}_{split}", epochs))
            for k in ("accuracy", "psnr_avg", "ssim_avg")
        }
    return {"losses": losses, "scalars": scalars, "evals": evals, "saved": saved}


@pytest.fixture(scope="module")
def whole_run(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("whole_run"))
    install_lmdb_shim()
    _install_profiler_stubs()

    crnn_mod = load_reference_module("model.crnn.crnn")
    metrics_mod = load_reference_module("utils.metrics")
    dataset_mod = load_reference_module("dataset.dataset")
    tsrn_mod = load_reference_module("model.tsrn")

    # the shared CRNN checkpoint: teacher, students and the eval recognizer
    # all load it (interfaces/base.py:634-660)
    torch.manual_seed(7)
    tm_crnn = crnn_mod.CRNN(32, 1, 37, 256).eval()
    crnn_path = os.path.join(tmp, "crnn.pth")
    torch.save(tm_crnn.state_dict(), crnn_path)

    # the shared SR init: both sides load this through their resume/import
    torch.manual_seed(11)
    tm_sr = tsrn_mod.TSRN_TL(
        scale_factor=2, width=128, height=32, STN=True, srb_nums=5,
        mask=True, hidden_units=HD_U,
    )
    sr_sd = {k: v.detach().numpy().copy() for k, v in tm_sr.state_dict().items()}
    sr_resume = os.path.join(tmp, "sr_init", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume))
    torch.save({"state_dict_G": tm_sr.state_dict()}, sr_resume)

    # a 1e-6-perturbed copy for the chaos-envelope control run (see fixture)
    sd2 = {k: v.clone() for k, v in tm_sr.state_dict().items()}
    with torch.no_grad():
        sd2["block1.0.weight"] = sd2["block1.0.weight"] + 1e-6
    sr_resume2 = os.path.join(tmp, "sr_init2", "sr_init.pth")
    os.makedirs(os.path.dirname(sr_resume2))
    torch.save({"state_dict_G": sd2}, sr_resume2)

    train_dir = os.path.join(tmp, "train")
    _write_lmdb(train_dir, _render_set(N_TRAIN, seed=1))
    val_dirs = []
    for si, split in enumerate(SPLITS):
        d = os.path.join(tmp, split)
        _write_lmdb(d, _render_set(N_VAL, seed=10 + si))
        # labels := the random CRNN's own HR predictions -> accuracy is live
        _relabel_with_crnn_preds(d, tm_crnn, metrics_mod, dataset_mod)
        val_dirs.append(d)

    ref = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume)
    # chaos-envelope control: the reference vs ITSELF with one weight
    # perturbed by 1e-6.  Adam's sign-like normalization amplifies
    # sub-1e-6 gradient noise to O(lr) parameter differences wherever
    # |grad| is small, so fp32 trajectories of ANY two implementations
    # (or the same one, re-run with an epsilon seed) diverge
    # super-exponentially; the control measures that intrinsic envelope,
    # and ours is asserted to stay within a margin of it.
    ref2 = run_reference(tmp, train_dir, val_dirs, crnn_path, sr_resume2)
    ours = run_ours(tmp, train_dir, val_dirs, crnn_path, sr_sd)
    return ref, ref2, ours


# ------------------------------------------------------------------- tests


def test_loss_first_iterations_tight(whole_run):
    """Iterations 1-3 match tightly.  Iter 1 is the pre-update loss
    composition; iter 2 is the loss after exactly ONE Adam + per-model-clip
    + BN-running-stat update — a systematic optimizer/BN bug (wrong beta,
    eps placement, biased running_var, clip grouping) shows here at ~1e-3
    relative, far above the fp-noise floor."""
    ref, _, ours = whole_run
    assert len(ref["losses"]) == EPOCHS
    assert len(ours["losses"]) == EPOCHS
    np.testing.assert_allclose(ours["losses"][0], ref["losses"][0], rtol=5e-6)
    np.testing.assert_allclose(ours["losses"][1], ref["losses"][1], rtol=1e-4)
    np.testing.assert_allclose(ours["losses"][2], ref["losses"][2], rtol=1e-3)


def test_loss_trajectory_within_chaos_envelope(whole_run):
    """The 10-iteration trajectory divergence stays within a margin of the
    reference's OWN self-divergence under a 1e-6 single-weight perturbation
    (the control run).  Under Adam, any epsilon difference is amplified
    super-exponentially (sign-like updates where |grad| ~ 0), so exact
    long-horizon equality is unattainable cross-framework in fp32; matching
    the measured chaos envelope is the strongest claim available — and a
    systematic update bias would blow through it immediately."""
    ref, ref2, ours = whole_run
    r = np.asarray(ref["losses"])
    c = np.asarray(ref2["losses"])
    o = np.asarray(ours["losses"])
    env = np.maximum.accumulate(np.abs(c - r) / r)  # monotone envelope
    rel = np.abs(o - r) / r
    tol = np.minimum(0.15, 1e-4 + 60.0 * env)
    assert (rel <= tol).all(), f"rel={rel}\nenv={env}\ntol={tol}"


def test_scalar_stream_matches(whole_run):
    """The TensorBoard scalar stream (loss/total and loss/SR at iter 5,
    reference scaling x100: super_resolution.py:425-448) matches within the
    trajectory envelope at that step."""
    ref, ref2, ours = whole_run
    env5 = max(abs(a - b) / a for a, b in
               zip(ref["losses"][:5], ref2["losses"][:5]))
    tol = min(0.15, 1e-4 + 60.0 * env5)
    for step in (5,):
        r_total = ref["scalars"].get("loss/total")[step]
        o_total = ours["scalars"][("loss/total", step)]
        np.testing.assert_allclose(o_total * 100.0, r_total, rtol=tol)
        r_sr = ref["scalars"].get("loss/SR")[step]
        o_sr = ours["scalars"][("loss/SR", step)]
        np.testing.assert_allclose(o_sr * 100.0, r_sr, rtol=tol)


def test_eval_metric_dict_matches(whole_run):
    """Final eval metric_dict {accuracy, psnr_avg, ssim_avg} per split
    (super_resolution.py:1299-1347): loader order, partial-batch handling,
    per-batch PSNR/SSIM aggregation and CTC decode+str_filt compose equal —
    tolerances derived from the chaos control run's own spread."""
    ref, ref2, ours = whole_run
    for split in SPLITS:
        r, c, o = ref["evals"][split], ref2["evals"][split], ours["evals"][split]
        assert r["accuracy"] is not None and o["accuracy"] is not None
        # accuracy counts are robust to the weight spread: the control run
        # must agree with the base run, and so must we
        assert abs(c["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, c)
        assert abs(o["accuracy"] - r["accuracy"]) < 5.1e-5, (split, r, o)
        for k in ("psnr_avg", "ssim_avg"):
            spread = abs(c[k] - r[k])
            tol = 60.0 * spread + 2e-3 * abs(r[k])
            assert abs(o[k] - r[k]) <= tol, (split, k, r[k], c[k], o[k], tol)


def test_eval_accuracy_is_live(whole_run):
    """The relabel trick must make accuracy a LIVE signal (strictly between
    0 and 1 somewhere), otherwise the accuracy assertions are vacuous."""
    ref, _, _ = whole_run
    accs = [ref["evals"][s]["accuracy"] for s in SPLITS]
    assert any(a and a > 0 for a in accs)
    assert any(a is not None and a < 1.0 for a in accs)


def test_best_checkpoint_decision_matches(whole_run):
    """is_best fires identically (reference saves only when the summed
    accuracy improves, super_resolution.py:525-533), and the recorded
    best_history dicts agree."""
    ref, _, ours = whole_run
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
