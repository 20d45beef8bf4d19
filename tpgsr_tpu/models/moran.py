"""MORAN eval recognizer — MORN offset-grid rectifier + ASRN attention
decoder.

Parity targets (model/moran/):
  * ``MORN``: morn.py:6-139 — offset CNN over a bilinear 32x100 downsample
    (maxpool stem, 5 conv-BN stages to 1 channel), relu(+)/relu(-) pooling
    trick (maxpool(2,1)), offsets sampled onto the base grid, vertical
    offsets added to grid_y, bilinear grid_sample of the input.  Training
    randomly skips rectification 50% of the time (we're eval-only: the
    ``test=True`` path, enhance=1 extra refinement iteration).
  * ``ASRN``: asrn_res.py:159-259 — 5-stage residual CNN (strides 2/2/
    (2,1)/(2,1)/(2,1): 32x100 -> 1x25) + 2 BidirectionalLSTM(256) + dual
    L2R/R2L attention decoders (BidirDecoder=True, interfaces/base.py:590).
  * ``Attention``/``AttentionCell``: asrn_res.py:27-156 — additive attention
    over T=25 frames, GRU cell over [context, char_embedding], greedy decode
    feeding argmax+1 back as the next embedding index.
  * ``fracPickup`` (asrn_res.py:52, train-only): attention-grid jitter —
    see ``frac_pickup`` below (explicit PRNG key); the frozen eval path
    never calls it.

Decode protocol (utils/utils_moran.py): alphabet
'0:1:...:z:$' — 36 chars + '$' as EOS; eval runs ``max_iter=20`` steps
(interfaces/base.py:622-631) and cuts the prediction at the first '$'.

TPU-first: decoder is an ``lax.scan`` over 20 static steps; the MORN
resampling reuses the shared grid_sample op.  Eval-only => train=False
everywhere, BN in inference mode.
"""

from __future__ import annotations

import string
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, BiLSTM, TorchConv, TorchLinear
from tpgsr_tpu.ops.grid_sample import grid_sample
from tpgsr_tpu.ops.resize import interpolate_bilinear

MORAN_ALPHABET = ":".join(string.digits + string.ascii_lowercase + "$")
MORAN_CHARS = (string.digits + string.ascii_lowercase + "$").split("$")[0] + "$"
MORAN_NCLASS = len(string.digits + string.ascii_lowercase + "$")  # 37, '$'=EOS
MORAN_MAX_ITER = 20


class _MornOffsetCNN(nn.Module):
    """MORN's offset head (morn.py:15-23) — a submodule so the enhance loop
    can re-apply it with shared weights."""

    @nn.compact
    def __call__(self, v, train: bool = False):
        v = nn.max_pool(v, (2, 2), (2, 2))
        for i, ch in enumerate((64, 128)):
            v = TorchConv(ch, (3, 3), padding=(1, 1), name=f"cnn{i}")(v)
            v = BatchNorm(name=f"cnn{i}_bn")(v, use_running_average=not train)
            v = nn.relu(v)
            v = nn.max_pool(v, (2, 2), (2, 2))
        for j, ch in enumerate((64, 16)):
            v = TorchConv(ch, (3, 3), padding=(1, 1), name=f"cnn{j + 2}")(v)
            v = BatchNorm(name=f"cnn{j + 2}_bn")(v, use_running_average=not train)
            v = nn.relu(v)
        v = TorchConv(1, (3, 3), padding=(1, 1), name="cnn4")(v)
        return BatchNorm(name="cnn4_bn")(v, use_running_average=not train)


class MORN(nn.Module):
    """Offset-grid rectifier (morn.py:6-85), eval path (test=True)."""

    target_h: int = 32
    target_w: int = 100
    enhance: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_list = np.arange(self.target_h) * 2.0 / (self.target_h - 1) - 1
        w_list = np.arange(self.target_w) * 2.0 / (self.target_w - 1) - 1
        gx, gy = np.meshgrid(w_list, h_list)  # [H, W]
        base_grid = jnp.asarray(
            np.stack([gx, gy], axis=-1)[None].astype(np.float32), x.dtype
        )  # [1, H, W, 2]
        b = x.shape[0]
        grid = jnp.broadcast_to(base_grid, (b, self.target_h, self.target_w, 2))
        grid_x = grid[..., 0:1]
        grid_y = grid[..., 1:2]

        offset_cnn = _MornOffsetCNN(name="cnn")

        def pooled_offsets(v):
            off = offset_cnn(v, train=train)
            pos = nn.max_pool(nn.relu(off), (2, 2), (1, 1))
            neg = nn.max_pool(nn.relu(-off), (2, 2), (1, 1))
            return pos - neg  # [B, h', w', 1]

        x_small = interpolate_bilinear(x, (self.target_h, self.target_w))
        offsets_pool = pooled_offsets(x_small)
        offsets_grid = grid_sample(offsets_pool, grid)  # [B, H, W, 1]
        sample_grid = jnp.concatenate([grid_x, grid_y + offsets_grid], axis=-1)
        x_rectified = grid_sample(x, sample_grid)

        for _ in range(self.enhance):
            offsets_pool = pooled_offsets(x_rectified)
            offsets_grid = offsets_grid + grid_sample(offsets_pool, grid)
            sample_grid = jnp.concatenate([grid_x, grid_y + offsets_grid], axis=-1)
            x_rectified = grid_sample(x, sample_grid)
        return x_rectified


class ResidualBlockASRN(nn.Module):
    """asrn_res.py:159-178: (conv3x3(stride)|conv1x1)-BN + conv3x3-BN + skip."""

    c_out: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        has_down = self.strides[0] > 1
        residual = x
        if has_down:
            conv1 = TorchConv(self.c_out, (3, 3), self.strides, padding=(1, 1), name="conv1")(x)
            residual = TorchConv(
                self.c_out, (3, 3), self.strides, padding=(1, 1), name="down_conv"
            )(x)
            residual = BatchNorm(name="down_bn")(residual, use_running_average=not train)
        else:
            conv1 = TorchConv(self.c_out, (1, 1), self.strides, name="conv1")(x)
        conv1 = BatchNorm(name="bn1")(conv1, use_running_average=not train)
        conv2 = TorchConv(self.c_out, (3, 3), padding=(1, 1), name="conv2")(conv1)
        conv2 = BatchNorm(name="bn2")(conv2, use_running_average=not train)
        return nn.relu(residual + conv2)


class ASRNResNet(nn.Module):
    """asrn_res.py:180-204: 5 stages to [B, 1, 25, 512]."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(32, (3, 3), padding=(1, 1), name="block0_conv")(x)
        x = BatchNorm(name="block0_bn")(x, use_running_average=not train)
        cfg = [(32, (2, 2), 3), (64, (2, 2), 4), (128, (2, 1), 6),
               (256, (2, 1), 6), (512, (2, 1), 3)]
        for li, (c_out, stride, repeat) in enumerate(cfg, start=1):
            x = ResidualBlockASRN(c_out, stride, name=f"block{li}_0")(x, train=train)
            for ri in range(1, repeat):
                x = ResidualBlockASRN(c_out, name=f"block{li}_{ri}")(x, train=train)
        return x


class MoranAttention(nn.Module):
    """Greedy attention decoder, eval path (asrn_res.py:68-156, test=True)."""

    num_classes: int = MORAN_NCLASS
    hidden: int = 256
    num_embeddings: int = 256
    num_steps: int = MORAN_MAX_ITER

    @nn.compact
    def __call__(self, feats_tbc):
        """feats: [T, B, hidden] -> probs [B, num_steps, num_classes]."""
        t, b, c = feats_tbc.shape
        char_emb = self.param(
            "char_embeddings", nn.initializers.normal(1.0),
            (self.num_classes + 1, self.num_embeddings),
        )
        feats_btc = jnp.transpose(feats_tbc, (1, 0, 2))

        i2h = TorchLinear(self.hidden, use_bias=False, name="i2h")
        h2h = TorchLinear(self.hidden, name="h2h")
        score = TorchLinear(1, use_bias=False, name="score")
        generator = TorchLinear(self.num_classes, name="generator")

        # GRUCell over [context(c) + embedding]
        from tpgsr_tpu.models.layers import torch_uniform_init

        in_dim = c + self.num_embeddings
        uni = torch_uniform_init(self.hidden)
        w_ih = self.param("gru_w_ih", uni, (3 * self.hidden, in_dim))
        w_hh = self.param("gru_w_hh", uni, (3 * self.hidden, self.hidden))
        b_ih = self.param("gru_b_ih", uni, (3 * self.hidden,))
        b_hh = self.param("gru_b_hh", uni, (3 * self.hidden,))

        feats_proj = i2h(feats_btc)  # precompute once [B,T,h]

        def step(mdl_unused, carry, _):
            hidden, target = carry
            s_proj = h2h(hidden)[:, None, :]
            emition = score(jnp.tanh(feats_proj + s_proj))[..., 0]  # [B,T]
            alpha = jax.nn.softmax(emition, axis=1)
            context = jnp.einsum("bt,btc->bc", alpha, feats_btc)
            emb = char_emb[target]
            gru_in = jnp.concatenate([context, emb], axis=-1)
            gi = gru_in @ w_ih.T + b_ih
            gh = hidden @ w_hh.T + b_hh
            i_r, i_z, i_n = jnp.split(gi, 3, -1)
            h_r, h_z, h_n = jnp.split(gh, 3, -1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            new_hidden = (1.0 - z) * n + z * hidden
            logits = generator(new_hidden)  # [B, nclass]
            next_target = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
            return (new_hidden, next_target), logits

        h0 = jnp.zeros((b, self.hidden), feats_tbc.dtype)
        t0 = jnp.zeros((b,), jnp.int32)
        carry = (h0, t0)
        outs = []
        for _ in range(self.num_steps):
            carry, logits = step(None, carry, None)
            outs.append(logits)
        return jnp.stack(outs, axis=1)  # [B, steps, nclass]


class ASRN(nn.Module):
    """CNN + BiLSTMs + (bidirectional) attention decoders."""

    num_classes: int = MORAN_NCLASS
    hidden: int = 256
    bidir_decoder: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = ASRNResNet(name="cnn")(x, train=train)
        b, h, w, c = conv.shape
        assert h == 1, f"ASRN conv height must be 1, got {h}"
        seq = conv[:, 0, :, :]  # [B, T, 512]
        seq = TorchLinear(self.hidden, name="rnn0_embedding")(
            BiLSTM(self.hidden, name="rnn0")(seq)
        )
        seq = TorchLinear(self.hidden, name="rnn1_embedding")(
            BiLSTM(self.hidden, name="rnn1")(seq)
        )
        feats = jnp.transpose(seq, (1, 0, 2))  # [T, B, h]
        out_l2r = MoranAttention(self.num_classes, self.hidden, name="attentionL2R")(feats)
        if self.bidir_decoder:
            # the R2L decoder attends over the SAME (unreversed) features —
            # only the teacher text is reversed in the reference
            # (asrn_res.py:258-260: attentionR2L(rnn, length, text_rev, test))
            out_r2l = MoranAttention(self.num_classes, self.hidden, name="attentionR2L")(
                feats
            )
            return out_l2r, out_r2l
        return out_l2r


class MORAN(nn.Module):
    """MORN + ASRN (moran.py:6-22); eval-only in TPGSR (base.py:587-606)."""

    num_classes: int = MORAN_NCLASS
    hidden: int = 256
    target_h: int = 32
    target_w: int = 100
    bidir_decoder: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B,32,100,1] grayscale (parse_moran_data).  Returns L2R probs
        [B, 20, nclass] (and R2L when bidirectional)."""
        x = MORN(self.target_h, self.target_w, name="MORN")(x, train=train)
        return ASRN(self.num_classes, self.hidden, self.bidir_decoder, name="ASRN")(
            x, train=train
        )


def decode_moran_ids(logits_bln: np.ndarray) -> list:
    """Greedy per-step argmax -> chars, cut at '$' (utils_moran decode with
    the 0:1:...:$ alphabet; id i -> alphabet[i], 36 == '$' terminator)."""
    chars = string.digits + string.ascii_lowercase + "$"
    out = []
    for row in np.asarray(logits_bln).argmax(-1):
        s = []
        for v in row:
            ch = chars[int(v)]
            if ch == "$":
                break
            s.append(ch)
        out.append("".join(s))
    return out


def frac_pickup(key, alpha_b1w: "jax.Array"):
    """Training-time attention jitter (model/moran/fracPickup.py): swap one
    random adjacent pair of attention columns by fractional interpolation.
    Eval never calls this (the TPGSR MORAN is frozen); provided with an
    explicit PRNG key for training parity.

    alpha: [B, 1, 1, W] attention weights -> same shape, resampled on a grid
    where one adjacent (idx-1, idx) pair is blended by beta ~ U(0, 1/4).
    """
    b = alpha_b1w.shape[0]
    w = alpha_b1w.shape[-1]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (), 0, w)
    beta = jax.random.uniform(k2, ()) / 4.0
    base = jnp.arange(w, dtype=jnp.float32) * 2.0 / (w - 1) - 1.0
    v_prev = base[jnp.clip(idx - 1, 0, w - 1)]
    v_cur = base[idx]
    val0 = beta * v_cur + (1 - beta) * v_prev
    val1 = beta * v_prev + (1 - beta) * v_cur
    inbounds = (idx > 0) & (idx < w - 1)
    grid_w = base
    grid_w = jnp.where((jnp.arange(w) == idx - 1) & inbounds, val0, grid_w)
    grid_w = jnp.where((jnp.arange(w) == idx) & inbounds, val1, grid_w)
    grid = jnp.stack([grid_w, jnp.zeros_like(grid_w)], -1)[None, None]  # [1,1,W,2]
    grid = jnp.broadcast_to(grid, (b, 1, w, 2))
    from tpgsr_tpu.ops.grid_sample import grid_sample

    x = jnp.reshape(alpha_b1w, (b, 1, w, 1))
    out = grid_sample(x, grid, align_corners=True)
    return jnp.reshape(out, alpha_b1w.shape)
