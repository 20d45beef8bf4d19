"""Importer validation against the PUBLISHED checkpoints' exact key surface.

The reference's accuracy numbers flow through four pretrained torch files
(crnn.pth, None-ResNet-None-CTC.pth, aster_demo.pth.tar, moran_demo.pth)
that are not on this machine.  These tests reconstruct each file's exact
state_dict surface — keys, shapes, AND wrapping (.tar {'state_dict': ...},
DataParallel 'module.' prefixes) — by instantiating the reference's OWN
model classes exactly as interfaces/base.py does, torch.saving them in the
published format, and asserting that:

  1. interop.load_torch_state_dict unwraps the file,
  2. the import_* converter consumes it into a variable tree whose
     structure+shapes EQUAL a fresh flax init (nothing missing, nothing
     extra, no silent drops),
  3. no reference tensor is dropped (element-count conservation), and
  4. the resulting flax model's forward matches the reference model run
     on the same input (eval mode).

Checkpoint construction sites in the reference:
  crnn.pth                  raw state_dict          base.py:634-660
  moran_demo.pth            'module.'-prefixed      base.py:587-606
  aster_demo.pth.tar        {'state_dict': sd}      base.py:831-842
  None-ResNet-None-CTC.pth  'module.'-prefixed      base.py:681-718
"""

from __future__ import annotations

from collections import OrderedDict
from types import SimpleNamespace

import jax
import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available
from tpgsr_tpu.interop import torch_import as ti
from tpgsr_tpu.interop.torch_import import load_torch_state_dict

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)


def _sd(model):
    return OrderedDict((k, v.detach()) for k, v in model.state_dict().items())


def _leaf_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def _assert_structure_matches_init(variables, init_variables):
    """Imported tree == fresh init tree: same key paths, same shapes."""
    for col in ("params", "batch_stats"):
        imported = _leaf_paths(dict(variables.get(col, {})))
        fresh = _leaf_paths(jax.tree_util.tree_map(np.asarray, dict(init_variables.get(col, {}))))
        assert imported.keys() == fresh.keys(), (
            f"{col}: missing={sorted(set(fresh) - set(imported))[:5]} "
            f"extra={sorted(set(imported) - set(fresh))[:5]}"
        )
        for path, shape in fresh.items():
            assert imported[path] == shape, f"{col} {path}: {imported[path]} != {shape}"


def _assert_elements_conserved(sd_numpy, variables, exclude=()):
    """Every reference tensor lands somewhere (no silent drops).

    ``exclude``: key prefixes of registered CONSTANT buffers (e.g. the TPS
    module's precomputed inverse_kernel/target_control_points,
    model/recognizer/tps_spatial_transformer.py:95-98) that our modules
    recompute deterministically at trace time instead of storing."""
    n_ref = sum(int(np.prod(v.shape)) for k, v in sd_numpy.items()
                if "num_batches_tracked" not in k
                and not any(k.startswith(p) for p in exclude))
    n_ours = sum(
        int(np.prod(np.shape(l)))
        for col in ("params", "batch_stats")
        for l in jax.tree_util.tree_leaves(dict(variables.get(col, {})))
    )
    assert n_ours == n_ref, f"imported {n_ours} elements of {n_ref}"


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()


def test_crnn_pth_key_surface(tmp_path, rng):
    from tpgsr_tpu.models.crnn import CRNN

    crnn_mod = load_reference_module("model.crnn.crnn")
    torch.manual_seed(0)
    tm = crnn_mod.CRNN(32, 1, 37, 256).eval()  # base.py:635
    path = tmp_path / "crnn.pth"
    torch.save(_sd(tm), path)  # raw state_dict, no wrapping

    sd = load_torch_state_dict(str(path))
    variables = ti.import_crnn(sd)
    model = CRNN(nclass=37)
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 1), np.float32), train=False)
    _assert_structure_matches_init(variables, init_vars)
    _assert_elements_conserved(sd, variables)

    x = rng.random((2, 32, 100, 1), dtype=np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x, train=False)), ref, atol=2e-4
    )


def test_moran_demo_pth_key_surface(tmp_path, rng):
    from tpgsr_tpu.models.moran import MORAN

    moran_mod = load_reference_module("model.moran.moran")
    torch.manual_seed(0)
    # base.py:589-591 (alphabet of 37 classes), CUDA=False for the CPU test
    tm = moran_mod.MORAN(1, 37, 256, 32, 100, BidirDecoder=True,
                         inputDataType="torch.FloatTensor", CUDA=False).eval()
    # calibrated-looking BN stats: with the fresh mean=0/var=1 stats, random
    # kaiming activations grow unboundedly through the 22 residual blocks and
    # fp32 accumulation noise swamps the comparison
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(1.0, 4.0, generator=g)
    path = tmp_path / "moran_demo.pth"
    # the published file carries DataParallel 'module.' prefixes (base.py:596-598)
    torch.save(OrderedDict(("module." + k, v) for k, v in _sd(tm).items()), path)

    sd = load_torch_state_dict(str(path))
    variables = ti.import_moran(sd)
    model = MORAN()
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 1), np.float32), train=False)
    _assert_structure_matches_init(variables, init_vars)
    _assert_elements_conserved(sd, variables)

    # full-forward parity vs the reference model (parse_moran_data protocol:
    # text='0'*20, test=True; base.py:608-632); argmax feedback can tie-break
    # differently after a few steps, so compare the robust first steps
    x = rng.random((2, 32, 100, 1), dtype=np.float32)
    utils_moran = load_reference_module("utils.utils_moran")
    converter = utils_moran.strLabelConverterForAttention(
        ":".join("0123456789abcdefghijklmnopqrstuvwxyz$"), ":"
    )
    t, l = converter.encode(["0" * 20] * 2)
    with torch.no_grad():
        ref_l2r, ref_r2l = tm(_nchw(x), l, t, t, test=True)
    # ASRN's test path returns BATCH-major packed rows: probs are permuted
    # to [B,T,C] then flattened per-sample (asrn_res.py:144-155)
    ref_l2r = ref_l2r.numpy().reshape(2, 20, 37)
    ref_r2l = ref_r2l.numpy().reshape(2, 20, 37)
    got_l2r, got_r2l = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got_l2r)[:, :3], ref_l2r[:, :3], atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_r2l)[:, :3], ref_r2l[:, :3], atol=5e-3)


def test_aster_demo_pth_tar_key_surface(tmp_path, rng):
    from tpgsr_tpu.models.aster import RecognizerBuilder

    rec = load_reference_module("model.recognizer.recognizer_builder")
    labelmaps = load_reference_module("utils.labelmaps")
    voc = labelmaps.get_vocabulary("all", EOS="EOS", PADDING="PADDING", UNKNOWN="UNKNOWN")
    eos_id = voc.index("EOS")
    torch.manual_seed(0)
    tm = rec.RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=len(voc), sDim=512, attDim=512,
        max_len_labels=100, eos="EOS", STN_ON=True,
    ).eval()  # base.py:833-836
    path = tmp_path / "aster_demo.pth.tar"
    torch.save({"state_dict": _sd(tm)}, path)  # .tar wrapping (base.py:838)

    sd = load_torch_state_dict(str(path))
    variables = ti.import_aster(sd)
    model = RecognizerBuilder(rec_num_classes=len(voc), eos_id=eos_id, max_len_labels=8)
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 128, 3), np.float32), False)
    _assert_structure_matches_init(variables, init_vars)
    _assert_elements_conserved(sd, variables, exclude=("tps.",))

    # encoder parity on the imported weights
    x = rng.random((2, 32, 100, 3), dtype=np.float32) * 2 - 1
    with torch.no_grad():
        ref = tm.encoder(_nchw(x)).numpy()
    got = np.asarray(
        model.apply(variables, x, False, method=lambda m, v, t: m.encoder(v, train=t))
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_aster_decoder_reference_parity(rng, monkeypatch):
    """Teacher-forced decoder + greedy sample vs the reference's OWN
    AttentionRecognitionHead (attention_recognition_head.py:26-67) on
    imported weights — round 1 only compared the encoder.  The reference
    head hard-codes ``.cuda()`` on its state/feedback tensors (GPU-bound by
    construction); a no-op patch keeps the math identical on CPU.  (Its
    ``beam_search`` additionally relies on pre-torch-1.5 integer ``/``
    semantics for the predecessor indices and cannot run under this torch;
    our beam is parity-tested against the golden mirror instead.)"""
    from tpgsr_tpu.models.aster import RecognizerBuilder

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
    rec = load_reference_module("model.recognizer.recognizer_builder")
    labelmaps = load_reference_module("utils.labelmaps")
    voc = labelmaps.get_vocabulary("all", EOS="EOS", PADDING="PADDING", UNKNOWN="UNKNOWN")
    eos_id = voc.index("EOS")
    L = 6
    torch.manual_seed(0)
    tm = rec.RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=len(voc), sDim=512, attDim=512,
        max_len_labels=L, eos="EOS", STN_ON=True,
    ).eval()
    variables = ti.import_aster(_sd(tm))
    model = RecognizerBuilder(rec_num_classes=len(voc), eos_id=eos_id, max_len_labels=L)

    x = rng.random((2, 32, 100, 3), dtype=np.float32) * 2 - 1
    targets = rng.integers(0, len(voc), size=(2, L)).astype(np.int32)
    with torch.no_grad():
        feats_t = tm.encoder(_nchw(x))
        ref_tf = tm.decoder([feats_t, torch.from_numpy(targets).long(), [L, L]]).numpy()
        ref_ids, ref_scores = tm.decoder.sample([feats_t, None, None])

    got_tf = np.asarray(
        model.apply(
            variables, x, targets,
            method=lambda m, v, t: m.decoder(m.encoder(v, train=False), t),
        )
    )
    np.testing.assert_allclose(got_tf, ref_tf, atol=5e-3)

    got_ids, got_scores = model.apply(
        variables, x,
        method=lambda m, v: m.decoder.sample(m.encoder(v, train=False)),
    )
    # argmax feedback chains can tie-break apart after a few steps on random
    # weights; the first steps are robust (same pattern as the MORAN test)
    np.testing.assert_array_equal(np.asarray(got_ids)[:, :3], ref_ids.numpy()[:, :3])
    np.testing.assert_allclose(
        np.asarray(got_scores)[:, :3], ref_scores.numpy()[:, :3], atol=5e-3
    )


def test_none_resnet_none_ctc_pth_key_surface(tmp_path, rng):
    from tpgsr_tpu.config import tpg_opt
    from tpgsr_tpu.models.opt_tpg import OPTModel

    model_mod = load_reference_module("model.crnn.model")
    opt = SimpleNamespace(**tpg_opt())  # main.py:60-75 hard-coded OPT config
    torch.manual_seed(0)
    tm = model_mod.Model(opt).eval()
    path = tmp_path / "None-ResNet-None-CTC.pth"
    # published file is DataParallel-saved (base.py:706-712 strips 'module.')
    torch.save(OrderedDict(("module." + k, v) for k, v in _sd(tm).items()), path)

    sd = load_torch_state_dict(str(path))
    variables = ti.import_opt(sd)
    model = OPTModel(nclass=opt.num_class)
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 1), np.float32), train=False)
    _assert_structure_matches_init(variables, init_vars)
    _assert_elements_conserved(sd, variables)

    x = rng.random((2, 32, 100, 1), dtype=np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x)).numpy()
    got = np.asarray(model.apply(variables, x, train=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)
