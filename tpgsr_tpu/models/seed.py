"""SEED — semantics-enhanced ASTER recognizer.

Parity target: model/SEED/ (2.8k LoC sub-repo).  In the reference, the
TPGSR wiring for SEED is a *dead path*: ``SEED_init``/``parse_SEED_data``
exist (interfaces/base.py:758-803,720-756) and the eval loop branches on
``test_model == "SEED"`` (super_resolution.py:871,937,1058), but
``ModelBuilder`` is never imported in base.py, so invoking it raises
NameError (SURVEY.md §2.6).  Here the path is implemented and WORKS.

Architecture (model/SEED/models/model_builder.py:22-120):
  ASTER encoder (same ResNet+BiLSTM) -> ``Embedding`` head (flattened
  [B, T*C] -> Linear -> 300-d semantic vector, embedding_head.py:6-18) ->
  attention decoder whose initial GRU state is ``embed_fc(embedding)``
  (attention_recognition_head.py:259-262) instead of zeros; beam search
  tiles that state across beams.  STN/TPS identical to ASTER's.

Losses for completeness: ``embedding_regression_loss`` (cosine, the
reference's EmbeddingRegressionLoss(loss_func='cosin')) and the standard
sequence cross entropy via teacher-forced logits.

Input adapter: parse_SEED_data (base.py:720-756) resizes to 32x100 and maps
[0,1] -> [-1,1]; note it differs from parse_aster_data's 32x128.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.aster import AttentionRecognitionHead, ResNetAster
from tpgsr_tpu.models.layers import TorchLinear
from tpgsr_tpu.models.stn import STNHead, TPSSpatialTransformer
from tpgsr_tpu.ops.resize import interpolate_bicubic, interpolate_bilinear


class Embedding(nn.Module):
    """Flattened encoder output -> 300-d semantic embedding
    (embedding_head.py:6-18)."""

    embed_dim: int = 300

    @nn.compact
    def __call__(self, x_btc):
        b = x_btc.shape[0]
        return TorchLinear(self.embed_dim, name="eEmbed")(x_btc.reshape(b, -1))


class SEEDModelBuilder(nn.Module):
    """The integrated SEED model (model_builder.py:22-120)."""

    rec_num_classes: int
    eos_id: int
    s_dim: int = 512
    att_dim: int = 512
    max_len_labels: int = 100
    time_step: int = 25
    stn_on: bool = False
    beam_width: int = 5

    def setup(self):
        self.encoder = ResNetAster(with_lstm=True, name="encoder")
        self.decoder = AttentionRecognitionHead(
            self.rec_num_classes, self.s_dim, self.att_dim, self.max_len_labels,
            name="decoder",
        )
        self.embeder = Embedding(300, name="embeder")
        # decoder.get_initial_state's embed_fc (SEED arh.py:251,259-262)
        self.embed_fc = TorchLinear(self.s_dim, name="embed_fc")
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
        """x: [B,32,W,3] in [-1,1] (parse_seed_data).  Beam-search decode."""
        if self.stn_on:
            x = self.rectify(x, train=train)
        feats = self.encoder(x, train=train)
        embed = self.embeder(feats)
        state0 = self.embed_fc(embed)
        ids, scores = self.decoder.beam_search(
            feats, self.beam_width, self.eos_id, state0=state0
        )
        return {
            "output": {"pred_rec": ids, "pred_rec_score": scores, "pred_embed": embed}
        }

    def teacher_forced(self, x, targets, train: bool = False):
        """Training-path logits + embedding (model_builder.py:101-106)."""
        if self.stn_on:
            x = self.rectify(x, train=train)
        feats = self.encoder(x, train=train)
        embed = self.embeder(feats)
        # seed the decoder state from the semantic embedding, like the
        # reference (attention_recognition_head.py:26-32 get_initial_state)
        logits = self.decoder(feats, targets, state0=self.embed_fc(embed))
        return logits, embed


def parse_seed_data(images_nhwc: jax.Array, width: int = 100) -> jax.Array:
    """[B,H,W,C>=3] in [0,1] -> [B,32,width,3] in [-1,1]
    (interfaces/base.py:720-756)."""
    x = interpolate_bicubic(images_nhwc[..., :3], (32, width))
    return (x - 0.5) / 0.5


def embedding_regression_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Cosine embedding loss, target label +1 (SEED
    embeddingRegressionLoss.py: CosineEmbeddingLoss): mean(1 - cos(pred, target))."""
    pn = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
    tn = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    return jnp.mean(1.0 - jnp.sum(pn * tn, axis=-1))
