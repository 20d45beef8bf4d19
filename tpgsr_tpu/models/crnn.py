"""CRNN recognizer — the default text-prior generator and eval recognizer.

Parity target: model/crnn/crnn.py:5-90 (meijieru CRNN) —
7-conv VGG trunk (pools shaping [B,1,32,100] gray input to [B,512,1,26])
followed by two BidirectionalLSTM blocks (LSTM + Linear), emitting
per-timestep 37-class logits in the reference's [T, B, C] layout.

Used as: frozen teacher TP (interfaces/super_resolution.py:297-299),
trainable student TPG (:316-319), and eval recognizer (test_bible['CRNN']).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, BiLSTM, TorchConv, TorchLinear


class BidirectionalLSTMHead(nn.Module):
    """LSTM(bidirectional) + per-timestep Linear (crnn.py:5-26)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x_btc):
        rec = BiLSTM(self.hidden, name="rnn")(x_btc)
        return TorchLinear(self.out, name="embedding")(rec)


class CRNN(nn.Module):
    """Input: [B, 32, 100, 1] grayscale in [0,1]; output [T=26, B, nclass]."""

    nclass: int = 37
    nh: int = 256
    leaky_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu else nn.relu

        def conv(i, feats, k, p, bn):
            def f(v):
                v = TorchConv(feats, (k, k), padding=(p, p), name=f"conv{i}")(v)
                if bn:
                    v = BatchNorm(name=f"batchnorm{i}")(v, use_running_average=not train)
                return act(v)

            return f

        x = conv(0, 64, 3, 1, False)(x)
        x = nn.max_pool(x, (2, 2), (2, 2))  # 16x50
        x = conv(1, 128, 3, 1, False)(x)
        x = nn.max_pool(x, (2, 2), (2, 2))  # 8x25
        x = conv(2, 256, 3, 1, True)(x)
        x = conv(3, 256, 3, 1, False)(x)
        x = nn.max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))  # 4x26
        x = conv(4, 512, 3, 1, True)(x)
        x = conv(5, 512, 3, 1, False)(x)
        x = nn.max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))  # 2x27
        x = conv(6, 512, 2, 0, True)(x)  # 1x26

        b, h, w, c = x.shape
        assert h == 1, f"the height of conv must be 1, got {h}"
        seq = x[:, 0, :, :]  # [B, T, C]
        seq = BidirectionalLSTMHead(self.nh, self.nh, name="rnn0")(seq)
        seq = BidirectionalLSTMHead(self.nh, self.nclass, name="rnn1")(seq)
        return jnp.transpose(seq, (1, 0, 2))  # [T, B, nclass]
