"""The "OPT" TPG — clova's configurable recognizer in its TPGSR configuration
None-ResNet-None-CTC (main.py:60-75).

Parity targets (model/crnn/):
  * ``Model``: model.py:25-95 — Trans(None) -> ResNet feature extractor ->
    AdaptiveAvgPool over height -> (no BiLSTM) -> Linear CTC head; output
    permuted to the reference's [T, B, C].
  * ``ResNet_FeatureExtractor`` (FAN): modules/feature_extraction.py:54-246
    — conv stem (oc/16 -> oc/8), 4 BasicBlock stages [1,2,5,3] with interleaved
    conv-BN and maxpools (2,2 / 2,2 / (2,1)+pad(0,1)), then conv k2 s(2,1)
    p(0,1) and conv k2 s1 p0 to [B, 512, 1, W/4+1].

Interface-compatible with ``CRNN``: [B, 32, W, 1] gray in -> [T, B, nclass]
logits, so it drops into the TPG slot (``--tpg=OPT``) everywhere CRNN does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, TorchConv, TorchLinear


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN (+1x1 downsample) (feature_extraction.py:117-150)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                        use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(self.planes, (1, 1), (self.stride, self.stride),
                                 use_bias=False, name="down_conv")(x)
            residual = BatchNorm(name="down_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class ResNetFAN(nn.Module):
    """FAN ResNet, layers [1,2,5,3] (feature_extraction.py:153-246)."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        blocks = [oc // 4, oc // 2, oc, oc]
        layers = [1, 2, 5, 3]

        def conv_bn(v, ch, k, s, p, name):
            v = TorchConv(ch, (k, k), (s, s) if isinstance(s, int) else s,
                          (p, p) if isinstance(p, int) else p, use_bias=False,
                          name=f"{name}_conv")(v)
            return BatchNorm(name=f"{name}_bn")(v, use_running_average=not train)

        x = nn.relu(conv_bn(x, oc // 16, 3, 1, 1, "conv0_1"))
        x = nn.relu(conv_bn(x, oc // 8, 3, 1, 1, "conv0_2"))

        inplanes = oc // 8
        for si, (planes, n) in enumerate(zip(blocks, layers), start=1):
            if si == 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
            elif si == 2:
                x = nn.max_pool(x, (2, 2), (2, 2))
            elif si == 3:
                x = nn.max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))
            x = BasicBlock(planes, downsample=(inplanes != planes),
                           name=f"layer{si}_0")(x, train=train)
            inplanes = planes
            for bi in range(1, n):
                x = BasicBlock(planes, name=f"layer{si}_{bi}")(x, train=train)
            if si < 4:
                x = nn.relu(conv_bn(x, planes, 3, 1, 1, f"conv{si}"))

        # conv4_1: k2 s(2,1) p(0,1); conv4_2: k2 s1 p0
        x = TorchConv(oc, (2, 2), (2, 1), (0, 1), use_bias=False, name="conv4_1_conv")(x)
        x = BatchNorm(name="conv4_1_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchConv(oc, (2, 2), (1, 1), (0, 0), use_bias=False, name="conv4_2_conv")(x)
        x = BatchNorm(name="conv4_2_bn")(x, use_running_average=not train)
        return nn.relu(x)


class OPTModel(nn.Module):
    """None-ResNet-None-CTC; CRNN-interface-compatible TPG."""

    nclass: int = 37
    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNetFAN(self.output_channel, name="FeatureExtraction")(x, train=train)
        # AdaptiveAvgPool2d((None, 1)) after permute [b,c,h,w]->[b,w,c,h]:
        # average over the (height) axis -> [B, W', C]
        feat = jnp.mean(feat, axis=1)
        logits = nn.Dense(
            self.nclass,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            name="Prediction",
        )(feat)
        return jnp.transpose(logits, (1, 0, 2))  # [T, B, C]


class VGGFeatureExtractor(nn.Module):
    """clova VGG extractor (modules/feature_extraction.py:5-28): the CRNN
    conv trunk variant used by FeatureExtraction='VGG'."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = [self.output_channel // 8, self.output_channel // 4,
              self.output_channel // 2, self.output_channel]
        x = nn.relu(TorchConv(oc[0], (3, 3), padding=(1, 1), name="conv0")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(TorchConv(oc[1], (3, 3), padding=(1, 1), name="conv1")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(TorchConv(oc[2], (3, 3), padding=(1, 1), name="conv2")(x))
        x = nn.relu(TorchConv(oc[2], (3, 3), padding=(1, 1), name="conv3")(x))
        # MaxPool2d((2,1),(2,1)): halve H only, W window 1 (feature_extraction.py:19)
        x = nn.max_pool(x, (2, 1), (2, 1))
        x = TorchConv(oc[3], (3, 3), padding=(1, 1), use_bias=False, name="conv4")(x)
        x = BatchNorm(name="bn4")(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchConv(oc[3], (3, 3), padding=(1, 1), use_bias=False, name="conv5")(x)
        x = BatchNorm(name="bn5")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 1), (2, 1))
        return nn.relu(TorchConv(oc[3], (2, 2), name="conv6")(x))


class OPTAttention(nn.Module):
    """clova attention predictor (modules/prediction.py:6-58): additive
    attention + LSTMCell over [context, one-hot(prev char)]; greedy decode."""

    num_classes: int
    hidden_size: int = 256
    max_length: int = 25

    @nn.compact
    def __call__(self, batch_h_btc, text=None, is_train: bool = False):
        from tpgsr_tpu.models.layers import torch_uniform_init

        b, t, c = batch_h_btc.shape
        num_steps = self.max_length + 1
        i2h = TorchLinear(self.hidden_size, use_bias=False, name="i2h")
        h2h = TorchLinear(self.hidden_size, name="h2h")
        score = TorchLinear(1, use_bias=False, name="score")
        generator = TorchLinear(self.num_classes, name="generator")
        uni = torch_uniform_init(self.hidden_size)
        in_dim = c + self.num_classes
        w_ih = self.param("lstm_w_ih", uni, (4 * self.hidden_size, in_dim))
        w_hh = self.param("lstm_w_hh", uni, (4 * self.hidden_size, self.hidden_size))
        b_ih = self.param("lstm_b_ih", uni, (4 * self.hidden_size,))
        b_hh = self.param("lstm_b_hh", uni, (4 * self.hidden_size,))

        feats_proj = i2h(batch_h_btc)

        def cell(hidden, cstate, char_onehot):
            e = score(jnp.tanh(feats_proj + h2h(hidden)[:, None, :]))[..., 0]
            alpha = jax.nn.softmax(e, axis=1)
            context = jnp.einsum("bt,btc->bc", alpha, batch_h_btc)
            xin = jnp.concatenate([context, char_onehot], -1)
            gi = xin @ w_ih.T + b_ih
            gh = hidden @ w_hh.T + b_hh
            i_, f_, g_, o_ = jnp.split(gi + gh, 4, -1)
            i_ = jax.nn.sigmoid(i_)
            f_ = jax.nn.sigmoid(f_)
            g_ = jnp.tanh(g_)
            o_ = jax.nn.sigmoid(o_)
            c_new = f_ * cstate + i_ * g_
            h_new = o_ * jnp.tanh(c_new)
            return h_new, c_new

        h0 = jnp.zeros((b, self.hidden_size))
        c0 = jnp.zeros((b, self.hidden_size))
        if is_train and text is not None:
            outs = []
            h, cst = h0, c0
            for i in range(num_steps):
                onehot = jax.nn.one_hot(text[:, i], self.num_classes)
                h, cst = cell(h, cst, onehot)
                outs.append(h)
            return generator(jnp.stack(outs, 1))
        # greedy
        outs = []
        h, cst = h0, c0
        tgt = jnp.zeros((b,), jnp.int32)  # [GO]
        for i in range(num_steps):
            onehot = jax.nn.one_hot(tgt, self.num_classes)
            h, cst = cell(h, cst, onehot)
            lg = generator(h)
            outs.append(lg)
            tgt = jnp.argmax(lg, -1).astype(jnp.int32)
        return jnp.stack(outs, 1)


def _naver_tps_constants(f: int, h: int, w: int):
    """The RARE GridGenerator's trace-time constants
    (modules/transformation.py:81-144): ``inv_delta_C`` [F+3, F+3] from the
    fixed rectified-image fiducials C (x in [-1,1], y = ∓1), and ``P_hat``
    [H*W, F+3] evaluating the TPS radial basis r²·log(r+1e-6) at every
    output pixel center ((2k+1)/size - 1, the align_corners=False grid)."""
    import numpy as np

    half = f // 2
    ctrl_x = np.linspace(-1.0, 1.0, half)
    c = np.concatenate(
        [np.stack([ctrl_x, -np.ones(half)], 1), np.stack([ctrl_x, np.ones(half)], 1)], 0
    )  # F x 2
    # inv_delta_C (transformation.py:105-125)
    hat_c = np.linalg.norm(c[:, None, :] - c[None, :, :], axis=2)
    np.fill_diagonal(hat_c, 1.0)
    hat_c = (hat_c ** 2) * np.log(hat_c)
    delta_c = np.concatenate(
        [
            np.concatenate([np.ones((f, 1)), c, hat_c], 1),
            np.concatenate([np.zeros((2, 3)), c.T], 1),
            np.concatenate([np.zeros((1, 3)), np.ones((1, f))], 1),
        ],
        0,
    )
    inv_delta_c = np.linalg.inv(delta_c)
    # P_hat (transformation.py:127-144); P ordered row-major over (y, x)
    gx = (np.arange(-w, w, 2) + 1.0) / w
    gy = (np.arange(-h, h, 2) + 1.0) / h
    p = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # (H*W) x 2
    r = np.linalg.norm(p[:, None, :] - c[None, :, :], axis=2)
    rbf = np.square(r) * np.log(r + 1e-6)
    p_hat = np.concatenate([np.ones((h * w, 1)), p, rbf], 1)
    return inv_delta_c.astype("float32"), p_hat.astype("float32")


class TPSTransformation(nn.Module):
    """RARE/NAVER TPS STN, exact to modules/transformation.py:7-155:
    LocalizationNetwork (4 conv-BN-ReLU stages + 3 maxpools + global avg pool
    + FC256 + FC to F*2 fiducials with zero weights and the fan-shaped bias
    of transformation.py:62-68), GridGenerator TPS solve against precomputed
    ``inv_delta_C``/``P_hat``, then a border-padded bilinear grid_sample
    (transformation.py:32, padding_mode='border')."""

    num_fiducial: int = 20
    i_size: tuple = (32, 100)

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as np

        from tpgsr_tpu.ops.grid_sample import grid_sample

        v = x
        for i, ch in enumerate((64, 128, 256, 512)):
            v = TorchConv(ch, (3, 3), padding=(1, 1), use_bias=False, name=f"conv{i}")(v)
            v = BatchNorm(name=f"bn{i}")(v, use_running_average=not train)
            v = nn.relu(v)
            if i < 3:
                v = nn.max_pool(v, (2, 2), (2, 2))
        v = jnp.mean(v, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        v = nn.relu(TorchLinear(256, name="fc1")(v))
        f = self.num_fiducial
        # fc2: zero weights; bias = fan init x∈[-1,1], y_top=linspace(0,-1),
        # y_bottom=linspace(1,0) (transformation.py:59-68)
        half = f // 2
        ctrl_x = np.linspace(-1.0, 1.0, half)
        top = np.stack([ctrl_x, np.linspace(0.0, -1.0, half)], 1)
        bot = np.stack([ctrl_x, np.linspace(1.0, 0.0, half)], 1)
        bias_init = np.concatenate([top, bot], 0).reshape(-1).astype(np.float32)
        w2 = self.param("fc2_kernel", nn.initializers.zeros, (256, f * 2))
        b2 = self.param("fc2_bias", lambda k, s: jnp.asarray(bias_init), (f * 2,))
        pts = (v @ w2 + b2).reshape(-1, f, 2)  # batch_C_prime [B, F, 2]
        h, w = self.i_size
        inv_delta_c, p_hat = _naver_tps_constants(f, h, w)
        cp = jnp.concatenate([pts, jnp.zeros((pts.shape[0], 3, 2), pts.dtype)], 1)
        t = jnp.einsum("ij,bjk->bik", jnp.asarray(inv_delta_c), cp)  # [B, F+3, 2]
        grid = jnp.einsum("nj,bjk->bnk", jnp.asarray(p_hat), t)
        grid = grid.reshape(pts.shape[0], h, w, 2)
        return grid_sample(x, grid, align_corners=False, padding_mode="border")


class OPTModelFull(nn.Module):
    """The fully configurable clova pipeline (model/crnn/model.py:25-95):
    Trans in {None, TPS}, Feat in {VGG, ResNet}, Seq in {None, BiLSTM},
    Pred in {CTC, Attn}.  TPGSR's --tpg=OPT uses None-ResNet-None-CTC
    (= OPTModel); the other stages are provided for the same ablations."""

    nclass: int = 37
    transformation: str = "None"
    feature_extraction: str = "ResNet"
    sequence_modeling: str = "None"
    prediction: str = "CTC"
    output_channel: int = 512
    hidden_size: int = 256

    @nn.compact
    def __call__(self, x, text=None, train: bool = False):
        if self.transformation == "TPS":
            x = TPSTransformation(
                i_size=(x.shape[1], x.shape[2]), name="Transformation"
            )(x, train=train)
        if self.feature_extraction == "VGG":
            feat = VGGFeatureExtractor(self.output_channel, name="FeatureExtraction")(
                x, train=train
            )
        else:
            feat = ResNetFAN(self.output_channel, name="FeatureExtraction")(x, train=train)
        feat = jnp.mean(feat, axis=1)  # AdaptiveAvgPool over height -> [B, T, C]
        if self.sequence_modeling == "BiLSTM":
            from tpgsr_tpu.models.layers import BiLSTM

            feat = TorchLinear(self.hidden_size, name="seq0_embedding")(
                BiLSTM(self.hidden_size, name="seq0")(feat)
            )
            feat = TorchLinear(self.hidden_size, name="seq1_embedding")(
                BiLSTM(self.hidden_size, name="seq1")(feat)
            )
        if self.prediction == "Attn":
            return OPTAttention(self.nclass, self.hidden_size, name="Prediction")(
                feat, text, is_train=train and text is not None
            )
        logits = nn.Dense(
            self.nclass,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            name="Prediction",
        )(feat)
        return jnp.transpose(logits, (1, 0, 2))  # [T, B, C]
