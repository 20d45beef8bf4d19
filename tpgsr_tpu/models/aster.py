"""ASTER eval recognizer — STN/TPS rectification, ResNet encoder, attention
GRU decoder with greedy and beam-search decoding.

Parity targets (model/recognizer/):
  * ``ResNet_ASTER``: resnet_aster.py:64-135 — conv32 stem + 5 stages of
    AsterBlocks (3/4/6/6/3 blocks, strides [2,2]/[2,2]/[2,1]/[2,1]/[2,1]:
    32x100 -> 1x25), optional 2-layer bidirectional LSTM(256).
  * ``AttentionRecognitionHead`` / ``AttentionUnit`` / ``DecoderUnit``:
    attention_recognition_head.py:11-268 — additive attention (tanh of
    sEmbed+xEmbed, scalar wEmbed), target embedding (yDim+1 rows, last row =
    <BOS>), single GRU step over [yProj, context], FC to classes.
  * ``RecognizerBuilder``: recognizer_builder.py:27-104 — STNHead on a
    bilinear (align_corners=True) 32x64 downsample, TPS to 32x100 with
    margins (0.05, 0.05), encoder, decoder; eval uses beam width 5.

TPU-first design: the decode loops are ``lax.scan`` with a static
``max_len`` (AsterInfo.max_len = 100); beam search is fully vectorized
(batch*beam flattening, top-k expansion, post-scan backtracking as a second
reverse scan) — no host round-trips, no dynamic shapes.  ASTER is eval-only
in TPGSR (frozen; interfaces/base.py:831-842), so it runs under jit with
``train=False`` throughout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, BiLSTM, TorchConv, TorchLinear
from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer
from tpgsr_tpu.ops.resize import interpolate_bilinear


class AsterBlock(nn.Module):
    """conv1x1(stride)-BN-ReLU-conv3x3-BN + residual (resnet_aster.py:38-61)."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, (1, 1), self.strides, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(
                self.planes, (1, 1), self.strides, use_bias=False, name="downsample_conv"
            )(x)
            residual = BatchNorm(name="downsample_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class ResNetAster(nn.Module):
    """[B,32,W,3] -> [B, W//4, 512] (or 2*256 with the LSTM head)."""

    with_lstm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(32, (3, 3), padding=(1, 1), use_bias=False, name="layer0_conv")(x)
        x = BatchNorm(name="layer0_bn")(x, use_running_average=not train)
        x = nn.relu(x)

        cfg = [(32, 3, (2, 2)), (64, 4, (2, 2)), (128, 6, (2, 1)),
               (256, 6, (2, 1)), (512, 3, (2, 1))]
        for li, (planes, blocks, stride) in enumerate(cfg, start=1):
            x = AsterBlock(planes, stride, downsample=True, name=f"layer{li}_block0")(
                x, train=train
            )
            for bi in range(1, blocks):
                x = AsterBlock(planes, name=f"layer{li}_block{bi}")(x, train=train)

        b, h, w, c = x.shape
        assert h == 1, f"encoder must reduce height to 1, got {h}"
        feat = x[:, 0, :, :]  # [B, T, 512]
        if self.with_lstm:
            feat = BiLSTM(256, name="rnn_l0")(feat)
            feat = BiLSTM(256, name="rnn_l1")(feat)
        return feat


class AttentionUnit(nn.Module):
    """Additive attention (attention_recognition_head.py:188-245)."""

    att_dim: int = 512

    @nn.compact
    def __call__(self, x_btc, s_prev):
        x_proj = TorchLinear(self.att_dim, name="xEmbed")(x_btc)  # [B,T,att]
        s_proj = TorchLinear(self.att_dim, name="sEmbed")(s_prev)  # [B,att]
        v = TorchLinear(1, name="wEmbed")(jnp.tanh(x_proj + s_proj[:, None, :]))
        return jax.nn.softmax(v[..., 0], axis=1)  # [B,T]


class DecoderUnit(nn.Module):
    """One attention-GRU decode step (attention_recognition_head.py:235-268)."""

    num_classes: int
    s_dim: int = 512
    att_dim: int = 512

    @nn.compact
    def __call__(self, x_btc, state, y_prev):
        """x: [B,T,C]; state: [B,sDim]; y_prev: [B] int ids (num_classes=<BOS>).

        Returns (logits [B,num_classes], new_state [B,sDim])."""
        alpha = AttentionUnit(self.att_dim, name="attention_unit")(x_btc, state)
        context = jnp.einsum("bt,btc->bc", alpha, x_btc)
        emb = nn.Embed(self.num_classes + 1, self.att_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="tgt_embedding")(y_prev.astype(jnp.int32))
        gru_in = jnp.concatenate([emb, context], axis=-1)

        # single torch-GRU step (gate order r,z,n)
        from tpgsr_tpu.models.layers import torch_uniform_init

        in_dim = gru_in.shape[-1]
        init = torch_uniform_init(self.s_dim)
        w_ih = self.param("gru_w_ih", init, (3 * self.s_dim, in_dim))
        w_hh = self.param("gru_w_hh", init, (3 * self.s_dim, self.s_dim))
        b_ih = self.param("gru_b_ih", init, (3 * self.s_dim,))
        b_hh = self.param("gru_b_hh", init, (3 * self.s_dim,))
        gi = gru_in @ w_ih.T + b_ih
        gh = state @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        new_state = (1.0 - z) * n + z * state

        logits = TorchLinear(self.num_classes, name="fc")(new_state)
        return logits, new_state


class AttentionRecognitionHead(nn.Module):
    """Teacher-forced forward, greedy sample, and beam search."""

    num_classes: int
    s_dim: int = 512
    att_dim: int = 512
    max_len: int = 100

    def setup(self):
        self.decoder = DecoderUnit(self.num_classes, self.s_dim, self.att_dim, name="decoder")

    def __call__(self, x_btc, targets_bl, state0=None):
        """Teacher-forced logits [B, L, num_classes] (training parity:
        attention_recognition_head.py:26-42 feeds target[i-1] at step i).

        ``state0`` seeds the decoder GRU state — zeros for ASTER, the
        semantic-embedding projection for SEED (SEED
        attention_recognition_head.py:26-32 get_initial_state)."""
        b = x_btc.shape[0]
        if state0 is None:
            state0 = jnp.zeros((b, self.s_dim), x_btc.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)
        l = targets_bl.shape[1]
        y_prevs = jnp.concatenate(
            [bos[:, None], targets_bl[:, : l - 1].astype(jnp.int32)], axis=1
        )

        def body(mdl, state, y_prev):
            logits, new_state = mdl.decoder(x_btc, state, y_prev)
            return new_state, logits

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        _, logits = scan(self, state0, y_prevs)
        return logits

    def sample(self, x_btc, state0=None):
        """Greedy decode: ([B, max_len] ids, [B, max_len] probs).

        ``state0`` lets SEED seed the decoder from its semantic embedding
        (SEED attention_recognition_head.py:31-32 get_initial_state)."""
        b = x_btc.shape[0]
        if state0 is None:
            state0 = jnp.zeros((b, self.s_dim), x_btc.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)

        def body(mdl, carry, _):
            state, y_prev = carry
            logits, new_state = mdl.decoder(x_btc, state, y_prev)
            probs = jax.nn.softmax(logits, axis=-1)
            score = jnp.max(probs, axis=-1)
            pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return (new_state, pred), (pred, score)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            length=self.max_len, out_axes=1,
        )
        _, (ids, scores) = scan(self, (state0, bos), None)
        return ids, scores

    def beam_search(self, x_btc, beam_width: int = 5, eos: int = 0, state0=None):
        """Vectorized beam search; returns ([B, max_len] ids, scores).

        Mirrors attention_recognition_head.py:69-185 (IBM TopKDecoder):
        expand b*k beams by top-k over k*C candidates, kill expansions of
        finished (<EOS>) beams, backtrack predecessors from the last step.
        """
        b, t, d = x_btc.shape
        k = beam_width
        c = self.num_classes
        # AABBCC inflation (view b,k)
        x_inf = jnp.repeat(x_btc, k, axis=0)  # [b*k, T, D]
        if state0 is None:
            state0 = jnp.zeros((b * k, self.s_dim), x_btc.dtype)
        else:
            state0 = jnp.repeat(state0, k, axis=0)  # tile_times=beam_width
        y0 = jnp.full((b * k,), self.num_classes, jnp.int32)
        seq_scores0 = jnp.where(
            (jnp.arange(b * k) % k) == 0, 0.0, -jnp.inf
        ).astype(x_btc.dtype)
        pos_index = (jnp.arange(b) * k)[:, None]  # [b,1]

        def body(mdl, carry, _):
            state, y_prev, seq_scores = carry
            logits, new_state = mdl.decoder(x_inf, state, y_prev)
            logp = jax.nn.log_softmax(logits, axis=-1)  # [b*k, C]
            # freeze finished beams: a beam that already emitted <EOS> can
            # only re-emit <EOS> at zero cost, so it keeps its slot and
            # score and stays competitive in the final top-1 (the reference
            # achieves the same by re-inserting early-EOS beams during
            # backtracking, attention_recognition_head.py:113-163)
            finished = (y_prev == eos)[:, None]
            eos_row = jnp.full((c,), -jnp.inf, logp.dtype).at[eos].set(0.0)
            logp = jnp.where(finished, eos_row[None, :], logp)
            cand_scores = seq_scores[:, None] + logp  # [b*k, C]
            scores, candidates = jax.lax.top_k(cand_scores.reshape(b, k * c), k)
            y_new = (candidates % c).reshape(b * k).astype(jnp.int32)
            new_seq_scores = scores.reshape(b * k).astype(x_btc.dtype)
            predecessors = (candidates // c + pos_index).reshape(b * k)
            new_state = new_state[predecessors]
            return (new_state, y_new, new_seq_scores), (
                new_seq_scores, predecessors.astype(jnp.int32), y_new
            )

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            length=self.max_len, out_axes=0,
        )
        _, (s_scores, s_pred, s_sym) = scan(self, (state0, y0, seq_scores0), None)
        # backtrack (reference backtracks from the sorted last-step beams and
        # additionally re-inserts early-EOS beams; for the TOP beam the
        # highest stored score at the last step is the optimal live beam)
        sorted_idx = jnp.argsort(-s_scores[-1].reshape(b, k), axis=1)  # [b,k]
        t_pred0 = (sorted_idx + pos_index).reshape(b * k)

        def back(carry, xs):
            t_predecessors = carry
            sym_t, pred_t = xs
            cur_sym = sym_t[t_predecessors]
            t_predecessors = pred_t[t_predecessors]
            return t_predecessors, cur_sym

        _, rev_syms = jax.lax.scan(back, t_pred0, (s_sym[::-1], s_pred[::-1]))
        ids = rev_syms[::-1].reshape(self.max_len, b, k)[:, :, 0]  # top beam
        ids = jnp.transpose(ids, (1, 0))  # [B, max_len]
        return ids, jnp.ones_like(ids)


class RecognizerBuilder(nn.Module):
    """Integrated ASTER model (recognizer_builder.py:27-104)."""

    rec_num_classes: int
    eos_id: int
    s_dim: int = 512
    att_dim: int = 512
    max_len_labels: int = 100
    stn_on: bool = True
    beam_width: int = 5

    def setup(self):
        self.encoder = ResNetAster(with_lstm=True, name="encoder")
        self.decoder = AttentionRecognitionHead(
            self.rec_num_classes, self.s_dim, self.att_dim, self.max_len_labels,
            name="decoder",
        )
        if self.stn_on:
            self.stn_head = STNHead(
                num_ctrlpoints=20, activation="none", last_pool=(2, 2), name="stn_head"
            )
            self.tps = TPSSpatialTransformer(
                output_image_size=(32, 100), num_control_points=20, margins=(0.05, 0.05)
            )

    def rectify(self, x, train: bool = False):
        stn_input = interpolate_bilinear(x, (32, 64), align_corners=True)
        _, ctrl_points = self.stn_head(stn_input, train=train)
        x, _ = self.tps(x, ctrl_points)
        return x

    def __call__(self, x, train: bool = False):
        """x: [B,32,128,3] in [-1,1] (parse_aster_data).  Beam-search ids."""
        if self.stn_on:
            x = self.rectify(x, train=train)
        feats = self.encoder(x, train=train)
        ids, scores = self.decoder.beam_search(feats, self.beam_width, self.eos_id)
        return {"output": {"pred_rec": ids, "pred_rec_score": scores}}

    def sample(self, x, train: bool = False):
        if self.stn_on:
            x = self.rectify(x, train=train)
        feats = self.encoder(x, train=train)
        ids, scores = self.decoder.sample(feats)
        return ids, scores


def decode_aster_ids(ids: np.ndarray, aster_info) -> list:
    """ids [B, L] -> strings (utils/metrics.py:20-68 get_string_aster: stop
    at EOS, skip UNKNOWN, then _normalize_text = keep alnum, lowercase).

    Quirk mirrored: _normalize_text filters TOKENS with a substring test
    (``x in string.digits + string.ascii_letters``), so a multi-char
    special token like 'PADDING' silently drops as a whole — it is NOT
    spelled out as the literal text 'padding'."""
    import string as _string

    keep = set(_string.digits + _string.ascii_letters)
    end = aster_info.char2id[aster_info.EOS]
    unk = aster_info.char2id[aster_info.UNKNOWN]
    out = []
    for row in np.asarray(ids):
        chars = []
        for v in row:
            v = int(v)
            if v == end:
                break
            if v != unk:
                tok = aster_info.id2char[v]
                if len(tok) == 1 and tok in keep:
                    chars.append(tok)
        out.append("".join(chars).lower())
    return out


def sequence_cross_entropy_loss(
    logits_blc: jax.Array, targets_bl: jax.Array, lengths_b: jax.Array
) -> jax.Array:
    """ASTER's training criterion (recognizer/sequenceCrossEntropyLoss.py):
    masked per-step cross entropy, summed then divided by batch size
    (sample_normalize=True)."""
    b, l, c = logits_blc.shape
    logp = jax.nn.log_softmax(logits_blc, axis=-1)
    picked = jnp.take_along_axis(
        logp, targets_bl[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    mask = (jnp.arange(l)[None, :] < lengths_b[:, None]).astype(logp.dtype)
    return -jnp.sum(picked * mask) / b
