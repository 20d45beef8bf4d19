"""Convert torch checkpoints (state_dicts) to flax variable trees.

The reference depends on pretrained torch recognizers for its accuracy
metrics (crnn.pth, None-ResNet-None-CTC.pth, aster_demo.pth.tar,
moran_demo.pth — interfaces/base.py:634-718, 831-842, 587-606).  These
converters make those checkpoints loadable:

  layout rules
    Conv2d        [O,I,kh,kw]  -> HWIO (kh,kw,I,O)
    ConvTranspose [I,O,kh,kw]  -> spatially flipped HWIO (see
                                  TorchConvTranspose docstring)
    Linear        [O,I]        -> (I,O)
    LSTM/GRU      torch layout kept verbatim (ops/rnn consumes it)
    BatchNorm     weight/bias -> params scale/bias;
                  running_mean/var -> batch_stats mean/var

Input is a plain ``{name: np.ndarray}`` dict; use ``load_torch_state_dict``
to read a .pth with torch if available, else a numpy .npz with the same keys.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.tar checkpoint (or an .npz) into numpy arrays."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch  # torch-cpu is available in this image

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        k = k.replace("module.", "")  # strip DataParallel prefixes (base.py:596-598)
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convT_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.flip(w, (2, 3)), (2, 3, 0, 1)).copy()


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _bn(params: Dict, stats: Dict, sd: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    """Map a torch BatchNorm to our BatchNorm wrapper (inner 'BatchNorm_0')."""
    inner = flax_path + ("BatchNorm_0",)
    _set(params, inner + ("scale",), sd[f"{torch_prefix}.weight"])
    _set(params, inner + ("bias",), sd[f"{torch_prefix}.bias"])
    _set(stats, inner + ("mean",), sd[f"{torch_prefix}.running_mean"])
    _set(stats, inner + ("var",), sd[f"{torch_prefix}.running_var"])


def _conv(params: Dict, sd: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    _set(params, flax_path + ("kernel",), conv_w(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])


def _convT(params: Dict, sd: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    _set(params, flax_path + ("kernel",), convT_w(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])


def _linear(params: Dict, sd: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    _set(params, flax_path + ("kernel",), linear_w(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])


def _rnn(params: Dict, sd: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    """Copy torch LSTM/GRU l0 (+reverse) weights verbatim."""
    for suffix in ("", "_reverse"):
        for part in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
            key = f"{torch_prefix}.{part}{suffix}"
            if key in sd:
                ours = part.replace("weight_", "w_").replace("bias_", "b_") + suffix
                _set(params, flax_path + (ours,), sd[key])


def import_crnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the meijieru CRNN state_dict (model/crnn/crnn.py:29-90)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(7):
        _conv(params, sd, f"cnn.conv{i}", (f"conv{i}",))
        if f"cnn.batchnorm{i}.weight" in sd:
            _bn(params, stats, sd, f"cnn.batchnorm{i}", (f"batchnorm{i}",))
    for j in (0, 1):
        _rnn(params, sd, f"rnn.{j}.rnn", (f"rnn{j}", "rnn"))
        _linear(params, sd, f"rnn.{j}.embedding", (f"rnn{j}", "embedding"))
    return {"params": params, "batch_stats": stats}


def import_tsrn(sd: Dict[str, np.ndarray], srb_nums: int = 5, tl: bool = True) -> Dict[str, Any]:
    """Map TSRN / TSRN_TL state_dicts (model/tsrn.py:18-215)."""
    params: Dict = {}
    stats: Dict = {}

    _conv(params, sd, "block1.0", ("block1_conv",))
    _set(params, ("block1_prelu", "alpha"), sd["block1.1.weight"])

    def grublock(tp, fp):
        _conv(params, sd, f"{tp}.conv1", fp + ("conv1",))
        _rnn(params, sd, f"{tp}.gru", fp + ("gru",))

    for i in range(srb_nums):
        tp = f"block{i + 2}"
        fp = (f"block{i + 2}",)
        _conv(params, sd, f"{tp}.conv1", fp + ("conv1",))
        _bn(params, stats, sd, f"{tp}.bn1", fp + ("bn1",))
        _conv(params, sd, f"{tp}.conv2", fp + ("conv2",))
        _bn(params, stats, sd, f"{tp}.bn2", fp + ("bn2",))
        grublock(f"{tp}.gru1", fp + ("gru1",))
        grublock(f"{tp}.gru2", fp + ("gru2",))

    if tl and "infoGen.tconv1.weight" in sd:
        _import_infogen(params, stats, sd)

    last = srb_nums + 2
    _conv(params, sd, f"block{last}.0", (f"block{last}_conv",))
    _bn(params, stats, sd, f"block{last}.1", (f"block{last}_bn",))

    if "coarse_proj.weight" in sd:  # TSRN_C2F (model/tsrn.py:241)
        _conv(params, sd, "coarse_proj", ("coarse_proj",))

    out_block = srb_nums + 3
    # UpsampleBLock(s) then final conv inside nn.Sequential
    j = 0
    while f"block{out_block}.{j}.conv.weight" in sd:
        _conv(params, sd, f"block{out_block}.{j}.conv", (f"block{out_block}_up{j}", "conv"))
        j += 1
    _conv(params, sd, f"block{out_block}.{j}", (f"block{out_block}_conv",))

    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


def _import_stn_head(params: Dict, stats: Dict, sd: Dict, tp: str, fp: Tuple[str, ...]):
    """Map STNHead (model/stn_head.py:25-106) onto models.stn.STNHead."""
    # stn_convnet indices of the conv blocks in the torch nn.Sequential
    # (conv3x3_block at 0,2,4,6,8,10; maxpools between)
    for n, cid in enumerate((0, 2, 4, 6, 8, 10)):
        blk = fp + (f"_ConvBlock_{n}",)
        _set(params, blk + ("kernel",), conv_w(sd[f"{tp}.stn_convnet.{cid}.0.weight"]))
        _set(params, blk + ("bias",), sd[f"{tp}.stn_convnet.{cid}.0.bias"])
        _bn(params, stats, sd, f"{tp}.stn_convnet.{cid}.1", blk)
    _set(params, fp + ("fc1_kernel",), linear_w(sd[f"{tp}.stn_fc1.0.weight"]))
    _set(params, fp + ("fc1_bias",), sd[f"{tp}.stn_fc1.0.bias"])
    # fc1 BatchNorm1d is the direct nn.BatchNorm inside STNHead
    inner = fp + ("BatchNorm_0",)
    _set(params, inner + ("scale",), sd[f"{tp}.stn_fc1.1.weight"])
    _set(params, inner + ("bias",), sd[f"{tp}.stn_fc1.1.bias"])
    _set(stats, inner + ("mean",), sd[f"{tp}.stn_fc1.1.running_mean"])
    _set(stats, inner + ("var",), sd[f"{tp}.stn_fc1.1.running_var"])
    _set(params, fp + ("fc2_kernel",), linear_w(sd[f"{tp}.stn_fc2.weight"]))
    _set(params, fp + ("fc2_bias",), sd[f"{tp}.stn_fc2.bias"])


def _rnn_layer(params: Dict, sd: Dict, torch_prefix: str, layer: int, flax_path: Tuple[str, ...]):
    """Copy one layer of a (multi-layer) torch LSTM/GRU into a BiLSTM/BiGRU
    module whose params are named ``w_ih_l0``-style (layer-local)."""
    for suffix in ("", "_reverse"):
        for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            key = f"{torch_prefix}.{part}_l{layer}{suffix}"
            if key in sd:
                ours = part.replace("weight_", "w_").replace("bias_", "b_") + f"_l0{suffix}"
                _set(params, flax_path + (ours,), sd[key])


def import_aster(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map an ASTER RecognizerBuilder state_dict (aster_demo.pth.tar,
    model/recognizer/recognizer_builder.py:27-104) onto models.aster."""
    params: Dict = {}
    stats: Dict = {}

    enc = ("encoder",)
    _conv(params, sd, "encoder.layer0.0", enc + ("layer0_conv",))
    _bn(params, stats, sd, "encoder.layer0.1", enc + ("layer0_bn",))
    layers = [3, 4, 6, 6, 3]
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            tp = f"encoder.layer{li}.{bi}"
            fp = enc + (f"layer{li}_block{bi}",)
            _conv(params, sd, f"{tp}.conv1", fp + ("conv1",))
            _bn(params, stats, sd, f"{tp}.bn1", fp + ("bn1",))
            _conv(params, sd, f"{tp}.conv2", fp + ("conv2",))
            _bn(params, stats, sd, f"{tp}.bn2", fp + ("bn2",))
            if f"{tp}.downsample.0.weight" in sd:
                _conv(params, sd, f"{tp}.downsample.0", fp + ("downsample_conv",))
                _bn(params, stats, sd, f"{tp}.downsample.1", fp + ("downsample_bn",))
    _rnn_layer(params, sd, "encoder.rnn", 0, enc + ("rnn_l0",))
    _rnn_layer(params, sd, "encoder.rnn", 1, enc + ("rnn_l1",))

    dec = ("decoder", "decoder")
    for lin in ("sEmbed", "xEmbed", "wEmbed"):
        _linear(params, sd, f"decoder.decoder.attention_unit.{lin}",
                dec + ("attention_unit", lin))
    _set(params, dec + ("tgt_embedding", "embedding"),
         sd["decoder.decoder.tgt_embedding.weight"])
    for part, ours in (("weight_ih_l0", "gru_w_ih"), ("weight_hh_l0", "gru_w_hh"),
                       ("bias_ih_l0", "gru_b_ih"), ("bias_hh_l0", "gru_b_hh")):
        _set(params, dec + (ours,), sd[f"decoder.decoder.gru.{part}"])
    _linear(params, sd, "decoder.decoder.fc", dec + ("fc",))

    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


def import_moran(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a MORAN state_dict (moran_demo.pth, model/moran/) onto
    models.moran.MORAN."""
    params: Dict = {}
    stats: Dict = {}

    # MORN offset CNN: Sequential indices (conv, bn) = (1,2) (5,6) (9,10)
    # (12,13) (15,16) -> our cnn0..cnn4 (+_bn), under MORN/cnn
    morn = ("MORN", "cnn")
    for ours, (ci, bi) in zip(
        ("cnn0", "cnn1", "cnn2", "cnn3", "cnn4"),
        ((1, 2), (5, 6), (9, 10), (12, 13), (15, 16)),
    ):
        _conv(params, sd, f"MORN.cnn.{ci}", morn + (ours,))
        _bn(params, stats, sd, f"MORN.cnn.{bi}", morn + (f"{ours}_bn",))

    # ASRN ResNet
    asrn = ("ASRN",)
    cnn = asrn + ("cnn",)
    _conv(params, sd, "ASRN.cnn.block0.0", cnn + ("block0_conv",))
    _bn(params, stats, sd, "ASRN.cnn.block0.1", cnn + ("block0_bn",))
    repeats = [3, 4, 6, 6, 3]
    for li, n in enumerate(repeats, start=1):
        for ri in range(n):
            tp = f"ASRN.cnn.block{li}.{ri}"
            fp = cnn + (f"block{li}_{ri}",)
            _conv(params, sd, f"{tp}.conv1.0", fp + ("conv1",))
            _bn(params, stats, sd, f"{tp}.conv1.1", fp + ("bn1",))
            _conv(params, sd, f"{tp}.conv2.0", fp + ("conv2",))
            _bn(params, stats, sd, f"{tp}.conv2.1", fp + ("bn2",))
            if f"{tp}.downsample.0.weight" in sd:
                _conv(params, sd, f"{tp}.downsample.0", fp + ("down_conv",))
                _bn(params, stats, sd, f"{tp}.downsample.1", fp + ("down_bn",))

    for j in (0, 1):
        _rnn_layer(params, sd, f"ASRN.rnn.{j}.rnn", 0, asrn + (f"rnn{j}",))
        _linear(params, sd, f"ASRN.rnn.{j}.embedding", asrn + (f"rnn{j}_embedding",))

    for att in ("attentionL2R", "attentionR2L"):
        tp = f"ASRN.{att}"
        if f"{tp}.char_embeddings" not in sd:
            continue
        fp = asrn + (att,)
        _set(params, fp + ("char_embeddings",), sd[f"{tp}.char_embeddings"])
        _linear(params, sd, f"{tp}.generator", fp + ("generator",))
        cell = f"{tp}.attention_cell"
        _linear(params, sd, f"{cell}.i2h", fp + ("i2h",))
        _linear(params, sd, f"{cell}.h2h", fp + ("h2h",))
        _linear(params, sd, f"{cell}.score", fp + ("score",))
        for part, ours in (("weight_ih", "gru_w_ih"), ("weight_hh", "gru_w_hh"),
                           ("bias_ih", "gru_b_ih"), ("bias_hh", "gru_b_hh")):
            _set(params, fp + (ours,), sd[f"{cell}.rnn.{part}"])
    return {"params": params, "batch_stats": stats}


def _import_fan_resnet(params: Dict, stats: Dict, sd: Dict, base: str, fe: Tuple[str, ...]):
    """FAN ResNet [1,2,5,3] (modules/feature_extraction.py:54-246) -> ResNetFAN."""

    def conv_bn(tp_conv, tp_bn, name):
        _conv(params, sd, f"{base}.{tp_conv}", fe + (f"{name}_conv",))
        _bn(params, stats, sd, f"{base}.{tp_bn}", fe + (f"{name}_bn",))

    conv_bn("conv0_1", "bn0_1", "conv0_1")
    conv_bn("conv0_2", "bn0_2", "conv0_2")
    layers = [1, 2, 5, 3]
    for si, n in enumerate(layers, start=1):
        for bi in range(n):
            tp = f"{base}.layer{si}.{bi}"
            fp = fe + (f"layer{si}_{bi}",)
            _conv(params, sd, f"{tp}.conv1", fp + ("conv1",))
            _bn(params, stats, sd, f"{tp}.bn1", fp + ("bn1",))
            _conv(params, sd, f"{tp}.conv2", fp + ("conv2",))
            _bn(params, stats, sd, f"{tp}.bn2", fp + ("bn2",))
            if f"{tp}.downsample.0.weight" in sd:
                _conv(params, sd, f"{tp}.downsample.0", fp + ("down_conv",))
                _bn(params, stats, sd, f"{tp}.downsample.1", fp + ("down_bn",))
        if si < 4:
            conv_bn(f"conv{si}", f"bn{si}", f"conv{si}")
    conv_bn("conv4_1", "bn4_1", "conv4_1")
    conv_bn("conv4_2", "bn4_2", "conv4_2")


def import_opt(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the clova None-ResNet-None-CTC state_dict
    (None-ResNet-None-CTC.pth, model/crnn/model.py:25-95) onto
    models.opt_tpg.OPTModel."""
    params: Dict = {}
    stats: Dict = {}
    _import_fan_resnet(params, stats, sd, "FeatureExtraction.ConvNet", ("FeatureExtraction",))
    _set(params, ("Prediction", "kernel"), linear_w(sd["Prediction.weight"]))
    _set(params, ("Prediction", "bias"), sd["Prediction.bias"])
    return {"params": params, "batch_stats": stats}


def import_opt_full(
    sd: Dict[str, np.ndarray],
    transformation: str = "None",
    feature_extraction: str = "ResNet",
    sequence_modeling: str = "None",
    prediction: str = "CTC",
) -> Dict[str, Any]:
    """Map any clova ``Model`` configuration's state_dict
    (model/crnn/model.py:25-95) onto models.opt_tpg.OPTModelFull.

    Covers the full stage grid: Trans in {None, TPS} (transformation.py:7-78),
    Feat in {VGG, ResNet} (feature_extraction.py:5-28, 54-246), Seq in
    {None, BiLSTM} (sequence_modeling.py:4-20), Pred in {CTC, Attn}
    (prediction.py:6-80)."""
    params: Dict = {}
    stats: Dict = {}
    if transformation == "TPS":
        tr = ("Transformation",)
        loc = "Transformation.LocalizationNetwork"
        # conv Sequential: Conv at 0/4/8/12, BN at 1/5/9/13 (transformation.py:44-54)
        for i, (ci, bi) in enumerate(((0, 1), (4, 5), (8, 9), (12, 13))):
            _conv(params, sd, f"{loc}.conv.{ci}", tr + (f"conv{i}",))
            _bn(params, stats, sd, f"{loc}.conv.{bi}", tr + (f"bn{i}",))
        _linear(params, sd, f"{loc}.localization_fc1.0", tr + ("fc1",))
        _set(params, tr + ("fc2_kernel",), linear_w(sd[f"{loc}.localization_fc2.weight"]))
        _set(params, tr + ("fc2_bias",), sd[f"{loc}.localization_fc2.bias"])
    fe = ("FeatureExtraction",)
    base = "FeatureExtraction.ConvNet"
    if feature_extraction == "VGG":
        # Sequential: Conv at 0/3/6/8/11/14/18, BN at 12/15 (feature_extraction.py:12-25)
        for name, ci in (("conv0", 0), ("conv1", 3), ("conv2", 6), ("conv3", 8),
                         ("conv4", 11), ("conv5", 14), ("conv6", 18)):
            _conv(params, sd, f"{base}.{ci}", fe + (name,))
        _bn(params, stats, sd, f"{base}.12", fe + ("bn4",))
        _bn(params, stats, sd, f"{base}.15", fe + ("bn5",))
    else:
        _import_fan_resnet(params, stats, sd, base, fe)
    if sequence_modeling == "BiLSTM":
        for i in range(2):
            tp = f"SequenceModeling.{i}"
            for part in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0",
                         "weight_ih_l0_reverse", "weight_hh_l0_reverse",
                         "bias_ih_l0_reverse", "bias_hh_l0_reverse"):
                _set(params, (f"seq{i}", part.replace("weight", "w").replace("bias", "b")),
                     sd[f"{tp}.rnn.{part}"])
            _linear(params, sd, f"{tp}.linear", (f"seq{i}_embedding",))
    if prediction == "Attn":
        pr = ("Prediction",)
        cell = "Prediction.attention_cell"
        _linear(params, sd, f"{cell}.i2h", pr + ("i2h",))
        _linear(params, sd, f"{cell}.h2h", pr + ("h2h",))
        _linear(params, sd, f"{cell}.score", pr + ("score",))
        for part, ours in (("weight_ih", "lstm_w_ih"), ("weight_hh", "lstm_w_hh"),
                           ("bias_ih", "lstm_b_ih"), ("bias_hh", "lstm_b_hh")):
            _set(params, pr + (ours,), sd[f"{cell}.rnn.{part}"])
        _linear(params, sd, "Prediction.generator", pr + ("generator",))
    else:
        _set(params, ("Prediction", "kernel"), linear_w(sd["Prediction.weight"]))
        _set(params, ("Prediction", "bias"), sd["Prediction.bias"])
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# SR backbone zoo importers (reference model/{srcnn,srresnet,rdn,vdsr,edsr,
# lapsrn,esrgan,rrdb}.py -> the same-named flax modules).  Shared by the
# reference-parity suite and by anyone carrying torch-trained SR weights.
# ---------------------------------------------------------------------------


def _import_infogen(params: Dict, stats: Dict, sd: Dict, tp: str = "infoGen",
                    fp: Tuple[str, ...] = ("infoGen",)):
    """InfoGen deconv pyramid (model/srcnn.py:18-47 and its per-backbone
    copies; same key names everywhere)."""
    for k in (1, 2, 3, 4):
        _convT(params, sd, f"{tp}.tconv{k}", fp + (f"tconv{k}",))
        _bn(params, stats, sd, f"{tp}.bn{k}", fp + (f"bn{k}",))


def import_srcnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """SRCNN / SRCNN_TL (model/srcnn.py:50-146) -> models.srcnn."""
    params: Dict = {}
    stats: Dict = {}
    for i in (1, 2, 3):
        _conv(params, sd, f"conv{i}", (f"conv{i}",))
    if "infoGen.tconv1.weight" in sd:
        _import_infogen(params, stats, sd)
    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


def import_srresnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """SRResNet / SRResNet_TL (model/srresnet.py:13-235) -> models.srresnet."""
    params: Dict = {}
    stats: Dict = {}
    _conv(params, sd, "block1.0", ("block1_conv",))
    _set(params, ("block1_prelu", "alpha"), sd["block1.1.weight"])
    for i in range(2, 7):
        fp = (f"block{i}",)
        _conv(params, sd, f"block{i}.conv1", fp + ("conv1",))
        _bn(params, stats, sd, f"block{i}.bn1", fp + ("bn1",))
        _set(params, fp + ("prelu", "alpha"), sd[f"block{i}.prelu.weight"])
        _conv(params, sd, f"block{i}.conv2", fp + ("conv2",))
        _bn(params, stats, sd, f"block{i}.bn2", fp + ("bn2",))
    _conv(params, sd, "block7.0", ("block7_conv",))
    _bn(params, stats, sd, "block7.1", ("block7_bn",))
    j = 0
    while f"block8.{j}.conv.weight" in sd:  # UpsampleBLock(s)
        _conv(params, sd, f"block8.{j}.conv", (f"block8_up{j}", "conv"))
        _set(params, (f"block8_up{j}", "prelu", "alpha"), sd[f"block8.{j}.prelu.weight"])
        j += 1
    _conv(params, sd, f"block8.{j}", ("block8_conv",))
    if "infoGen.tconv1.weight" in sd:
        _import_infogen(params, stats, sd)
    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


def import_rdn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """RDN / RDN_TL (model/rdn.py:54-214) -> models.rdn."""
    params: Dict = {}
    stats: Dict = {}
    _conv(params, sd, "conv1", ("conv1",))
    _conv(params, sd, "conv2", ("conv2",))
    for k in (1, 2, 3):
        i = 0
        while f"RDB{k}.dense_layers.{i}.conv.weight" in sd:
            _conv(params, sd, f"RDB{k}.dense_layers.{i}.conv",
                  (f"RDB{k}", f"dense{i}", "conv"))
            i += 1
        _conv(params, sd, f"RDB{k}.conv_1x1", (f"RDB{k}", "conv_1x1"))
    _conv(params, sd, "GFF_1x1", ("GFF_1x1",))
    _conv(params, sd, "GFF_3x3", ("GFF_3x3",))
    _conv(params, sd, "conv_up", ("conv_up",))
    _conv(params, sd, "conv3", ("conv3",))
    if "infoGen.tconv1.weight" in sd:
        _import_infogen(params, stats, sd)
    return {"params": params, "batch_stats": stats}


def import_vdsr(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """VDSR / VDSR_TL (model/vdsr.py:39-233) -> models.vdsr.  All convs are
    bias-free; the plain variant keeps blocks in ``residual_layer.{i}``,
    the TL variant in ``block{1..6}``."""
    params: Dict = {}
    stats: Dict = {}
    _set(params, ("input", "kernel"), conv_w(sd["input.weight"]))
    _set(params, ("output", "kernel"), conv_w(sd["output.weight"]))
    i = 0
    while f"residual_layer.{i}.conv.weight" in sd:
        _set(params, (f"block{i + 1}", "kernel"),
             conv_w(sd[f"residual_layer.{i}.conv.weight"]))
        i += 1
    k = 1
    while f"block{k}.conv.weight" in sd:
        _set(params, (f"block{k}", "kernel"), conv_w(sd[f"block{k}.conv.weight"]))
        k += 1
    if "infoGen.tconv1.weight" in sd:
        _import_infogen(params, stats, sd)
    return {"params": params, "batch_stats": stats}


def import_edsr(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """EDSR (model/edsr.py:35-90) -> models.edsr.EDSR.  The frozen MeanShift
    convs (identity kernel, +/-rgb_mean bias) are plain arithmetic on our
    side and are not imported."""
    params: Dict = {}
    _set(params, ("conv_input", "kernel"), conv_w(sd["conv_input.weight"]))
    i = 0
    while f"residual.{i}.conv1.weight" in sd:
        for c in ("conv1", "conv2"):
            _set(params, (f"res{i}", c, "kernel"), conv_w(sd[f"residual.{i}.{c}.weight"]))
        i += 1
    _set(params, ("conv_mid", "kernel"), conv_w(sd["conv_mid.weight"]))
    j = 0
    while f"upscale.{2 * j}.weight" in sd:  # conv at even indices, PixelShuffle between
        _set(params, (f"up{j}", "kernel"), conv_w(sd[f"upscale.{2 * j}.weight"]))
        j += 1
    _set(params, ("conv_output", "kernel"), conv_w(sd["conv_output.weight"]))
    return {"params": params, "batch_stats": {}}


def import_lapsrn(sd: Dict[str, np.ndarray], scale_factor: int = 2) -> Dict[str, Any]:
    """LapSRN (model/lapsrn.py:57-137) -> models.lapsrn.LapSRN.  The torch
    module always allocates the x4 pyramid stage; only the stages our module
    instantiates for ``scale_factor`` are imported."""
    params: Dict = {}
    stats: Dict = {}
    _set(params, ("conv_input", "kernel"), conv_w(sd["conv_input.weight"]))
    stages = 1 if scale_factor == 2 else 2
    for s in range(1, stages + 1):
        fb = f"convt_F{s}"
        for i in range(10):
            _set(params, (fb, f"conv{i}", "kernel"),
                 conv_w(sd[f"{fb}.0.cov_block.{2 * i}.weight"]))
        _set(params, (fb, "deconv", "kernel"), convT_w(sd[f"{fb}.0.cov_block.20.weight"]))
        _set(params, (f"convt_I{s}", "kernel"), convT_w(sd[f"convt_I{s}.weight"]))
        _set(params, (f"convt_R{s}", "kernel"), conv_w(sd[f"convt_R{s}.weight"]))
    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


def import_rrdbnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """RRDBNet (model/esrgan.py:55-90) / RRDBNet_TL blocks (model/rrdb.py)
    -> models.rrdb."""
    params: Dict = {}
    _conv(params, sd, "conv_first", ("conv_first",))
    i = 0
    while f"RRDB_trunk.{i}.RDB1.conv1.weight" in sd:
        for k in (1, 2, 3):
            for c in range(1, 6):
                _conv(params, sd, f"RRDB_trunk.{i}.RDB{k}.conv{c}",
                      (f"RRDB{i}", f"RDB{k}", f"conv{c}"))
        i += 1
    _conv(params, sd, "trunk_conv", ("trunk_conv",))
    j = 1
    while f"upconv{j}.weight" in sd:
        _conv(params, sd, f"upconv{j}", (f"upconv{j}",))
        j += 1
    _conv(params, sd, "HRconv", ("HRconv",))
    _conv(params, sd, "conv_last", ("conv_last",))
    return {"params": params, "batch_stats": {}}


def import_rrdb_tl_block(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """A single RRDB_TL residual-in-residual block (model/rrdb.py:96-127)
    -> models.rrdb.RRDB_TL (keys RDB{1..3}.conv{1..5})."""
    params: Dict = {}
    for k in (1, 2, 3):
        for c in range(1, 6):
            _conv(params, sd, f"RDB{k}.conv{c}", (f"RDB{k}", f"conv{c}"))
    return {"params": params, "batch_stats": {}}


def _import_feature_enhancer(params: Dict, sd: Dict, tp: str, fp: Tuple[str, ...]):
    """FeatureEnhancerW2V (model/model_transformer.py:407-446): 4-linear
    multihead attention (annotated-transformer ``linears.{0..3}`` ->
    linear_q/k/v/out), two LayerNorms, PFF.  The reference declares a
    ``w2v_proj`` linear but bypasses it in forward; it is not imported."""
    mh = fp + ("mask_multihead",)
    for i, ours in enumerate(("linear_q", "linear_k", "linear_v", "linear_out")):
        _linear(params, sd, f"{tp}.mask_multihead.linears.{i}", mh + (ours,))
    for ln in ("mul_layernorm1", "mul_layernorm3"):
        _set(params, fp + (ln, "a_2"), sd[f"{tp}.{ln}.a_2"])
        _set(params, fp + (ln, "b_2"), sd[f"{tp}.{ln}.b_2"])
    _linear(params, sd, f"{tp}.pff.w_1", fp + ("pff", "w_1"))
    _linear(params, sd, f"{tp}.pff.w_2", fp + ("pff", "w_2"))


def import_sem_tsrn(sd: Dict[str, np.ndarray], srb_nums: int = 5) -> Dict[str, Any]:
    """SEM_TSRN (model/tsrn.py:286-370) -> models.tsrn.SEM_TSRN."""
    params: Dict = {}
    stats: Dict = {}
    _conv(params, sd, "block1.0", ("block1_conv",))
    _set(params, ("block1_prelu", "alpha"), sd["block1.1.weight"])
    for i in range(srb_nums):
        tp = f"block{i + 2}"
        fp = (f"block{i + 2}",)
        _conv(params, sd, f"{tp}.conv1", fp + ("conv1",))
        _bn(params, stats, sd, f"{tp}.bn1", fp + ("bn1",))
        _conv(params, sd, f"{tp}.conv2", fp + ("conv2",))
        _bn(params, stats, sd, f"{tp}.bn2", fp + ("bn2",))
        _import_feature_enhancer(params, sd, f"{tp}.feature_enhancer",
                                 fp + ("feature_enhancer",))
    _linear(params, sd, "w2v_proj.vec_proj", ("w2v_proj", "vec_proj"))
    last = srb_nums + 2
    _conv(params, sd, f"block{last}.0", (f"block{last}_conv",))
    _bn(params, stats, sd, f"block{last}.1", (f"block{last}_bn",))
    out_block = srb_nums + 3
    j = 0
    while f"block{out_block}.{j}.conv.weight" in sd:
        _conv(params, sd, f"block{out_block}.{j}.conv", (f"block{out_block}_up{j}", "conv"))
        j += 1
    _conv(params, sd, f"block{out_block}.{j}", (f"block{out_block}_conv",))
    if "stn_head.stn_fc2.weight" in sd:
        _import_stn_head(params, stats, sd, "stn_head", ("stn_head",))
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Arch-keyed dispatch + reference-format checkpoint restore.
#
# The reference resumes from its own .pth checkpoints — a dict with
# 'state_dict_G' (interfaces/base.py:402-424), saved per cascade stage as
# ckpt/<vis_dir>/model_best_<i>.pth plus raw recognizer_best_<i>.pth
# state_dicts (base.py:546-575).  These entry points let OUR trainer resume
# from those exact files, so published TPGSR checkpoints drop in unchanged.


def import_sr_checkpoint(
    arch: str, sd: Dict[str, np.ndarray], srb_nums: int = 5, scale_factor: int = 2
) -> Dict[str, Any]:
    """Import one SR-generator state_dict for a registry arch name.

    TL/STN/mask sub-structures are detected from key presence inside each
    importer, so one entry covers both the plain and _tl variants.
    """
    a = arch.lower()
    if a.startswith("tsrn"):  # tsrn / _tl / _wmask / _cascade / _c2f
        return import_tsrn(sd, srb_nums=srb_nums)
    if a == "sem_tsrn":
        return import_sem_tsrn(sd, srb_nums=srb_nums)
    if a.startswith("srcnn"):
        return import_srcnn(sd)
    if a.startswith("srres"):
        return import_srresnet(sd)
    if a.startswith("rdn"):
        return import_rdn(sd)
    if a.startswith("vdsr"):
        return import_vdsr(sd)
    if a == "edsr":
        return import_edsr(sd)
    if a == "lapsrn":
        return import_lapsrn(sd, scale_factor=scale_factor)
    if a.startswith("esrgan"):
        return import_rrdbnet(sd)
    raise ValueError(f"no torch importer for arch {arch!r}")


def _load_reference_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a reference save_dict .pth and return its 'state_dict_G'."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict_G" in obj:
        obj = obj["state_dict_G"]
    out = {}
    for k, v in obj.items():
        k = k.replace("module.", "")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def is_torch_checkpoint(path: str) -> bool:
    """True when ``path`` is a reference-format torch checkpoint: a
    .pth/.pt/.pth.tar file, or a directory holding model_best_<i>.pth
    (the reference's per-stage best saves, base.py:405-412)."""
    if os.path.isdir(path):
        return os.path.exists(os.path.join(path, "model_best_0.pth"))
    return path.endswith((".pth", ".pt", ".tar"))


def restore_reference_checkpoint(path: str, state, arch: str,
                                 srb_nums: int = 5, scale_factor: int = 2):
    """Restore a reference torch checkpoint (file or ckpt dir) into a
    TrainState — the TPU-side twin of base.py:402-424's resume.

    File: the single ``state_dict_G`` loads into EVERY SR stage — the
    reference calls ``generator_init(i)`` per stage and each call loads the
    same ``self.resume`` file (super_resolution.py:87-94 + base.py:412) —
    and sibling ``recognizer_best_<i>.pth`` / ``recognizer_best.pth`` files
    next to the file restore the student TPGs (super_resolution.py:140-163
    probes ``dirname(resume)`` for them).  Directory: model_best_<i>.pth per
    SR stage and recognizer_best_<i>.pth per student, read from INSIDE the
    dir (where save_checkpoint put them, base.py:546-575; the reference's
    own dir-form probe looks one level up and so silently finds nothing).
    The Adam state is NOT restored (the reference never saves it).
    """
    n_sr = len(state.sr_params)
    sr_trees = [None] * n_sr
    stu_trees = [None] * len(state.stu_params)

    def _probe_students(d: str):
        for i in range(len(stu_trees)):
            for name in (f"recognizer_best_{i}.pth", "recognizer_best.pth"):
                f = os.path.join(d, name)
                if os.path.exists(f):
                    stu_trees[i] = import_crnn(load_torch_state_dict(f))
                    break

    if os.path.isdir(path):
        for i in range(n_sr):
            f = os.path.join(path, f"model_best_{i}.pth")
            if os.path.exists(f):
                sr_trees[i] = import_sr_checkpoint(
                    arch, _load_reference_pth(f), srb_nums, scale_factor)
        _probe_students(path)
    else:
        tree = import_sr_checkpoint(
            arch, _load_reference_pth(path), srb_nums, scale_factor)
        for i in range(n_sr):
            sr_trees[i] = tree
        _probe_students(os.path.dirname(os.path.abspath(path)))

    def merge(params, stats, trees):
        ps, ss = list(params), list(stats)
        for i, tree in enumerate(trees):
            if tree is not None:
                ps[i] = tree["params"]
                ss[i] = tree.get("batch_stats", ss[i]) or ss[i]
        return tuple(ps), tuple(ss)

    sr_params, sr_stats = merge(state.sr_params, state.sr_stats, sr_trees)
    stu_params, stu_stats = merge(state.stu_params, state.stu_stats, stu_trees)
    return state.replace(sr_params=sr_params, sr_stats=sr_stats,
                         stu_params=stu_params, stu_stats=stu_stats)
